"""Kill/resume demonstration at scale (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

The unit tests pin resume semantics at toy size; this script records the
same guarantee at >=400k pages against the real spark-submit entrypoint
(bin/run_pipeline.py), with a hard SIGKILL of the whole process group —
the crash mode the atomic tmp+rename manifest commit is designed for.

Protocol (three subprocess runs, sequential — never two Spark jobs at
once on this box):

  A. run_pipeline --synthetic N with a checkpoint dir; SIGKILL the whole
     process group the moment the ``$RESUME_KILL_AFTER`` stage manifest
     commits (default: linked_mentions — so candidates + triples are
     mid-flight or unstarted when the axe falls)
  B. identical rerun, same checkpoint dir -> must resume: stages
     committed in A keep their ``_manifest.json`` md5 byte-for-byte (proof the
     work was reused, not redone), later stages recompute, run completes
  C. clean run, fresh directories (ground truth, no checkpointing noise)

Pass criteria, appended to BENCH/resume.jsonl and summarized in
BENCH/BASELINE.md's manual section by hand:
  - md5 over the sorted (subj,pred,obj,score,url) triples of B == C
  - every stage manifest present after the kill is unchanged after B
  - wall(B) < wall(C)  (resume actually saved the reused stages' work)

Usage:  RESUME_PAGES=400000 python BENCH/resume_demo.py
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGES = int(os.environ.get("RESUME_PAGES", "400000"))
KILL_AFTER = os.environ.get("RESUME_KILL_AFTER", "linked_mentions")
WORK = os.environ.get("RESUME_WORKDIR", "/tmp/pfs_resume_demo")


def _cmd(out: str, ckpt: str | None) -> list[str]:
    c = [sys.executable, os.path.join(REPO, "bin", "run_pipeline.py"),
         "--synthetic", str(PAGES), "--out", out]
    if ckpt:
        c += ["--checkpoint-dir", ckpt]
    return c


def _env() -> dict:
    return dict(os.environ, PYTHONPATH=REPO)


def _manifests(ckpt: str) -> dict[str, str]:
    """stage -> md5 of the FULL _manifest.json bytes (not just
    committed_at: a recompute landing within timestamp granularity would
    falsely count as reused under a committed_at-only compare)."""
    out = {}
    if not os.path.isdir(ckpt):
        return out
    for stage in sorted(os.listdir(ckpt)):
        mp = os.path.join(ckpt, stage, "_manifest.json")
        if os.path.exists(mp):
            with open(mp, "rb") as f:
                raw = f.read()
            try:
                json.loads(raw)
            except json.JSONDecodeError:
                out[stage] = "<torn>"
            else:
                out[stage] = hashlib.md5(raw).hexdigest()
    return out


def killed_run(out: str, ckpt: str) -> dict[str, str]:
    """Run A: launch in its own process group, SIGKILL the group as soon
    as the KILL_AFTER stage manifest commits."""
    p = subprocess.Popen(
        _cmd(out, ckpt), env=_env(), start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    target = os.path.join(ckpt, KILL_AFTER, "_manifest.json")
    try:
        while p.poll() is None:
            if os.path.exists(target):
                os.killpg(p.pid, signal.SIGKILL)
                break
            time.sleep(0.5)
        p.wait(timeout=60)
    finally:
        if p.poll() is None:  # pragma: no cover - safety net
            os.killpg(p.pid, signal.SIGKILL)
    if not os.path.exists(target):
        raise SystemExit(f"run A finished before {KILL_AFTER} committed — "
                         f"raise RESUME_PAGES")
    time.sleep(2)  # let the orphaned JVM die before the next run
    return _manifests(ckpt)


def full_run(out: str, ckpt: str | None) -> float:
    t0 = time.time()
    r = subprocess.run(_cmd(out, ckpt), env=_env(), capture_output=True,
                       text=True, timeout=3600)
    if r.returncode != 0:
        raise SystemExit(f"run failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    return round(time.time() - t0, 1)


def triples_md5(out: str) -> tuple[str, int]:
    """Order-independent content hash of the committed triples table (the
    same md5-of-sorted-row-md5s shape the driver's oracle compare uses)."""
    import duckdb

    q = f"""
      SELECT md5(string_agg(h, '' ORDER BY h)) AS digest, count(*) AS n
      FROM (SELECT md5(concat_ws('|', subj, pred, obj,
                                 round(score, 6)::VARCHAR, url)) AS h
            FROM read_parquet('{out}/triples/*.parquet'))
    """
    digest, n = duckdb.sql(q).fetchone()
    return digest, int(n)


def main() -> None:
    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    a_out, a_ckpt = os.path.join(WORK, "resumed", "out"), os.path.join(WORK, "resumed", "stages")
    c_out, c_ckpt = os.path.join(WORK, "clean", "out"), os.path.join(WORK, "clean", "stages")
    for d in (a_out, a_ckpt, c_out, c_ckpt):
        os.makedirs(d, exist_ok=True)

    print(f"[A] killed run: {PAGES} pages, SIGKILL after {KILL_AFTER} commits",
          flush=True)
    after_kill = killed_run(a_out, a_ckpt)
    print(f"[A] manifests at kill: {after_kill}", flush=True)

    print("[B] resumed rerun", flush=True)
    wall_b = full_run(a_out, a_ckpt)
    after_b = _manifests(a_ckpt)
    reused = sorted(s for s in after_kill
                    if after_kill[s] != "<torn>" and after_b.get(s) == after_kill[s])
    recomputed = sorted(s for s in after_b if s not in reused)

    print("[C] clean run (ground truth)", flush=True)
    wall_c = full_run(c_out, c_ckpt)

    md5_b, n_b = triples_md5(a_out)
    md5_c, n_c = triples_md5(c_out)
    rec = {
        "pages": PAGES, "kill_after": KILL_AFTER,
        "manifests_at_kill": after_kill,
        "stages_reused": reused, "stages_recomputed": recomputed,
        "wall_resumed_sec": wall_b, "wall_clean_sec": wall_c,
        "triples": n_b, "md5_resumed": md5_b, "md5_clean": md5_c,
        "identical": md5_b == md5_c and n_b == n_c,
        "all_killed_stages_reused": all(
            s in reused for s in after_kill if after_kill[s] != "<torn>"),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(os.path.join(REPO, "BENCH", "resume.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=2))
    if not rec["identical"]:
        raise SystemExit("FAIL: resumed output differs from clean run")
    if not rec["all_killed_stages_reused"]:
        raise SystemExit("FAIL: a committed stage was recomputed on resume")


if __name__ == "__main__":
    main()
