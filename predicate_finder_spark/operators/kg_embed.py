"""TransE knowledge-graph embedding: bounded deterministic fit +
distributed link-prediction scoring.

Closes the KG training loop the engine's other pieces open — extraction
(plans/pipeline.py) -> graph materialization -> negative sampling
(operators/kg_negatives.py) -> THIS: embedding fit and link-prediction
eval.  TransE (Bordes et al., "Translating Embeddings for Modeling
Multi-relational Data", NIPS 2013, public): score(s, p, o) =
-||e_s + r_p - e_o||_2, trained with a margin ranking loss against
corrupted triples.

Architecture is the engine's established training loop (operators/
train.py): candidate/negative generation runs DISTRIBUTED, the fit
collects a BOUNDED sample to the driver (hash-thresholded, never
corpus-order-dependent), numpy fits, and the embeddings broadcast back as
model bytes for distributed scoring.

Determinism contract (same as the IRLS fit, stronger than any SGD
recipe): md5-seeded init, FULL-BATCH gradient descent with a fixed
iteration count, pairs sorted lexicographically before the fit — the
model bytes are reproducible bit-for-bit across runs and parallelism.

Scale shape of the distributed side: entity/relation dictionaries are
DIM-SIZED (same contract as every broadcast dictionary here); scoring is
an Arrow-batched pandas UDF doing ONE vectorized gather + norm per batch;
link-prediction ranks against the full entity matrix as one matmul per
batch — O(batch x E x dim) with E dictionary-bounded, never a join
against a corpus-sized side.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from predicate_finder_spark.operators.kg_negatives import corrupt_triples


def _hash_unit(key: str) -> float:
    """Uniform [-1, 1) as a pure function of the key (md5 — the same
    engine-portable construction as synth._u)."""
    h = int(hashlib.md5(key.encode("utf-8")).hexdigest()[:12], 16)
    return (h % 1000003) / 1000003.0 * 2.0 - 1.0


def _init_matrix(names: list[str], dim: int, tag: str) -> np.ndarray:
    mat = np.array(
        [[_hash_unit(f"{tag}|{n}|{d}") for d in range(dim)] for n in names],
        dtype=np.float64,
    )
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def serialize_transe(ent_names, ent_vecs, rel_names, rel_vecs) -> bytes:
    buf = io.BytesIO()
    np.savez(
        buf,
        ent_names=np.asarray(ent_names, dtype=object),
        ent_vecs=np.asarray(ent_vecs, dtype=np.float64),
        rel_names=np.asarray(rel_names, dtype=object),
        rel_vecs=np.asarray(rel_vecs, dtype=np.float64),
    )
    return buf.getvalue()


def deserialize_transe(model_bytes: bytes):
    z = np.load(io.BytesIO(model_bytes), allow_pickle=True)
    return (
        [str(x) for x in z["ent_names"]],
        z["ent_vecs"],
        [str(x) for x in z["rel_names"]],
        z["rel_vecs"],
    )


def fit_transe(
    triples: DataFrame,
    entities: DataFrame,
    dim: int = 16,
    n_neg: int = 2,
    iters: int = 200,
    lr: float = 0.1,
    margin: float = 1.0,
    max_triples: int = 20_000,
    seed: str = "kgneg",
) -> bytes:
    """Fit TransE embeddings; returns model bytes for
    :func:`transe_score_udf` / :func:`link_prediction_eval`.

    The collect is bounded: if the distinct triple set exceeds
    ``max_triples`` the fit trains on the deterministic md5-threshold
    sample (a pure function of the triple, so the training set is
    identical at any parallelism — never ``limit()`` over an unordered
    frame).  Negatives come from the SAME distributed
    ``corrupt_triples`` draw used everywhere else (``with_source=True``
    pairs each negative with its positive for the margin loss).
    """
    base = triples.select("subj", "pred", "obj").distinct()
    n_total = base.count()
    if n_total == 0:
        raise ValueError("fit_transe: empty triple set")
    if n_total > max_triples:
        frac_scale = 2**31
        thresh = int(frac_scale * (max_triples / n_total))
        key = F.concat_ws("|", "subj", "pred", "obj", F.lit("transe-sample"))
        base = base.filter(
            (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % frac_scale)
            < thresh
        )
    rows = corrupt_triples(
        base, entities, n_neg=n_neg, seed=seed, with_source=True
    ).toPandas()

    pos = rows[rows.label == 1.0]
    neg = rows[rows.label == 0.0]
    ent_names = sorted(
        set(pos.subj) | set(pos.obj) | set(neg.subj) | set(neg.obj)
    )
    rel_names = sorted(set(pos.pred))
    e_idx = {e: i for i, e in enumerate(ent_names)}
    r_idx = {r: i for i, r in enumerate(rel_names)}

    # (pos, neg) pairs, sorted for order-independent float accumulation
    neg = neg.sort_values(["src_subj", "pred", "src_obj", "slot"]).reset_index(
        drop=True
    )
    ps = neg.src_subj.map(e_idx).to_numpy()
    po = neg.src_obj.map(e_idx).to_numpy()
    ns = neg.subj.map(e_idx).to_numpy()
    no = neg.obj.map(e_idx).to_numpy()
    pr = neg.pred.map(r_idx).to_numpy()

    E = _init_matrix(ent_names, dim, "transe-ent")
    R = _init_matrix(rel_names, dim, "transe-rel")
    n_pairs = max(len(neg), 1)
    for _ in range(iters):
        dp = E[ps] + R[pr] - E[po]          # positive residuals
        dn = E[ns] + R[pr] - E[no]          # negative residuals
        dpn = np.linalg.norm(dp, axis=1)
        dnn = np.linalg.norm(dn, axis=1)
        active = (margin + dpn - dnn) > 0
        if not active.any():
            break
        # d||v||/dv = v/||v||; accumulate per-index gradients with np.add.at
        gp = dp[active] / np.maximum(dpn[active], 1e-12)[:, None]
        gn = dn[active] / np.maximum(dnn[active], 1e-12)[:, None]
        gE = np.zeros_like(E)
        gR = np.zeros_like(R)
        np.add.at(gE, ps[active], gp)
        np.add.at(gE, po[active], -gp)
        np.add.at(gR, pr[active], gp)
        np.add.at(gE, ns[active], -gn)
        np.add.at(gE, no[active], gn)
        np.add.at(gR, pr[active], -gn)
        E -= lr * gE / n_pairs
        R -= lr * gR / n_pairs
        # standard TransE constraint: entities stay on the unit ball
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        np.maximum(norms, 1.0, out=norms)
        E /= norms
    return serialize_transe(ent_names, E, rel_names, R)


def transe_score_udf(model_bytes: bytes):
    """Arrow-batched scorer column: score(subj, pred, obj) =
    -||e_s + r_p - e_o|| (higher = more plausible).  Unknown entity or
    relation -> null.  One vectorized gather + norm per batch."""
    ent_names, E, rel_names, R = deserialize_transe(model_bytes)
    e_idx = {e: i for i, e in enumerate(ent_names)}
    r_idx = {r: i for i, r in enumerate(rel_names)}

    @pandas_udf("double")
    def score(subj: pd.Series, pred: pd.Series, obj: pd.Series) -> pd.Series:
        si = subj.map(e_idx)
        pi = pred.map(r_idx)
        oi = obj.map(e_idx)
        ok = si.notna() & pi.notna() & oi.notna()
        out = pd.Series(np.nan, index=subj.index, dtype="float64")
        if ok.any():
            s = E[si[ok].astype(int).to_numpy()]
            p = R[pi[ok].astype(int).to_numpy()]
            o = E[oi[ok].astype(int).to_numpy()]
            out[ok] = -np.linalg.norm(s + p - o, axis=1)
        return out

    return score


def link_prediction_eval(
    test: DataFrame, model_bytes: bytes, k: int = 3
) -> dict[str, float]:
    """hits@k and mean rank of the true object among ALL dictionary
    entities (object-corruption protocol, raw setting).  Per batch: one
    (batch x E) distance matmul against the broadcast entity matrix —
    E is dictionary-bounded.  Returns driver-side aggregate scalars."""
    ent_names, E, rel_names, R = deserialize_transe(model_bytes)
    e_idx = {e: i for i, e in enumerate(ent_names)}
    r_idx = {r: i for i, r in enumerate(rel_names)}

    @pandas_udf("long")
    def rank_of_true(subj: pd.Series, pred: pd.Series, obj: pd.Series) -> pd.Series:
        si = subj.map(e_idx)
        pi = pred.map(r_idx)
        oi = obj.map(e_idx)
        ok = si.notna() & pi.notna() & oi.notna()
        out = pd.Series(-1, index=subj.index, dtype="int64")
        if ok.any():
            q = E[si[ok].astype(int).to_numpy()] + R[pi[ok].astype(int).to_numpy()]
            # (b, E) pairwise distances to every candidate object
            d = np.linalg.norm(q[:, None, :] - E[None, :, :], axis=2)
            true_d = d[np.arange(len(q)), oi[ok].astype(int).to_numpy()]
            out[ok] = (d < true_d[:, None]).sum(axis=1) + 1
        return out

    ranked = test.select(
        rank_of_true(F.col("subj"), F.col("pred"), F.col("obj")).alias("rank")
    ).filter(F.col("rank") > 0)
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg((F.col("rank") <= k).cast("double")).alias("hits"),
        F.avg(F.col("rank").cast("double")).alias("mean_rank"),
    ).first()
    return {
        "n": int(agg["n"]),
        f"hits@{k}": float(agg["hits"] or 0.0),
        "mean_rank": float(agg["mean_rank"] or 0.0),
    }
