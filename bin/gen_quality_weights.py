"""Fit and print the pinned quality-classifier weights.

Regenerates ``PINNED_QUALITY_WEIGHTS`` in operators/quality.py: fits the
IRLS logistic on the deterministic labeled sample (synth_quality_sample,
first 300 docs — the same train split tests/test_quality.py uses) and
prints the raw-space weights as JSON.  The fit is Newton on a strictly
convex L2-regularized objective, so the solution is unique; row-order
summation noise stays below 1e-8 (test_quality asserts the refit matches
the pinned values to 1e-6).

Run: PYTHONPATH=/root/repo python bin/gen_quality_weights.py
"""

from __future__ import annotations

import json

from predicate_finder_spark import get_spark
from predicate_finder_spark.operators.models import deserialize_linear_model
from predicate_finder_spark.operators.quality import fit_quality_classifier
from predicate_finder_spark.synth import synth_quality_sample

if __name__ == "__main__":
    spark = get_spark(app_name="gen-quality-weights", master="local[4]")
    sample = synth_quality_sample(spark, 400).filter("doc_id < 300")
    w, b = deserialize_linear_model(fit_quality_classifier(sample))
    print(json.dumps({"w": [float(x) for x in w], "b": float(b)}))
