"""End-to-end pipeline plans (stage orchestration, checkpoint/resume,
graph materialization)."""
