"""Deterministic content-hash sampling / splitting.

The reproducibility primitive every large-scale training-data pipeline
needs: sample membership and train/val/test assignment derive from a
content hash, not RNG state, so they are stable across reruns, engines,
partitionings, and cluster sizes (``df.sample``/``sampleBy`` are only
stable for a fixed partition layout). md5 is the hash on purpose — any
engine (DuckDB, Postgres, Python) reproduces the same assignment, which
also makes these operators oracle-checkable.

u(key) = int(md5(key || salt)[:8 hex], 16) / 2³² ∈ [0, 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_uniform(col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform [0,1) from a key column (+ salt).

    Change the salt to draw an independent sample from the same corpus.
    NULL keys hash as the sentinel string ``<null>`` (every null-key
    row shares one draw per salt) — without the coalesce the md5 would
    be NULL, every comparison three-valued-unknown, and null-key rows
    would silently vanish from samples, splits, mixtures, and
    replications regardless of rate.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(
        F.concat(F.coalesce(c.cast("string"), F.lit("<null>")), F.lit(salt))
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(
        float(2**32)
    )


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, deterministically by key content."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.filter(hash_uniform(key_col, salt) < rate)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to one named split with the given proportions.

    Assignment is a pure function of (key, salt): a document keeps its
    split across reruns and corpus growth — no train/test leakage when
    the corpus is re-ingested.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    u = hash_uniform(key_col, salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        expr = (
            F.when(u < cum, F.lit(name))
            if expr is None
            else expr.when(u < cum, F.lit(name))
        )
    expr = (
        expr.otherwise(F.lit(names[-1]))
        if expr is not None
        else F.lit(names[-1])
    )
    return df.withColumn(out_col, expr)


def stratified_mixture(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str,
    key_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Domain-weighted corpus mixing: keep each group's rows at that
    group's own deterministic hash-sample rate — the data-mixing step of
    a training pipeline (upweight curated sources, downweight crawl)
    expressed as ONE narrow codegen filter: no shuffle, no per-group
    jobs, and membership is a pure function of (key, salt) so a document
    keeps its fate across reruns, partitionings, and corpus growth
    (same md5 primitive as :func:`hash_sample`; any engine replays it).

    Groups absent from ``rates`` keep ``default_rate`` of their rows
    (0.0 = dropped entirely). Rates must lie in [0, 1]: sampling cannot
    upweight beyond a group's size — replicate rows explicitly if an
    over-1.0 epoch mix is wanted, so the duplication is visible in the
    plan rather than hidden in a sampler.
    """
    for g, r in list(rates.items()) + [("<default>", default_rate)]:
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0,1], got {r}")
    rate = F.lit(float(default_rate))
    for g, r in rates.items():
        rate = F.when(F.col(group_col) == F.lit(g), F.lit(float(r))).otherwise(
            rate
        )
    return df.filter(hash_uniform(key_col, salt) < rate)


def epoch_replicate(
    df: DataFrame,
    epochs: float,
    key_col: str = "doc_id",
    salt: str = "",
    out_col: str = "epoch",
) -> DataFrame:
    """Deterministic fractional-epoch replication — the >1.0 half of
    data mixing (:func:`stratified_mixture` covers rates ≤ 1): every
    row appears ``floor(epochs)`` times, plus once more for the
    hash-selected ``epochs − floor(epochs)`` fraction of keys. Adds
    ``out_col`` (0-based copy index) so downstream shuffles spread the
    copies and training code can salt per-epoch transforms.

    Replication is explicit row multiplication in the plan (an explode
    over a per-row sequence — no join, no shuffle), and the copy count
    is a pure function of (key, salt): re-runs rebuild the identical
    mixture. ``epochs`` in [0, ∞); 0 keeps nothing.
    """
    if epochs < 0:
        raise ValueError(f"epochs must be >= 0, got {epochs}")
    whole = int(epochs)
    frac = float(epochs) - whole
    k = F.lit(whole) + (hash_uniform(key_col, salt) < F.lit(frac)).cast("int")
    # sequence(0, -1) would DESCEND in Spark — guard k = 0 explicitly
    copies = F.when(k > 0, F.sequence(F.lit(0), k - F.lit(1))).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(out_col, F.explode(copies))
