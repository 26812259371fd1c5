"""Vector math over ``array<float>`` embedding columns as native
higher-order functions — JVM-side, codegen-friendly, no UDFs.

Accumulation is strictly sequential left-to-right (``aggregate``) so
results are bit-identical to a DuckDB oracle written with the same
order (``list_reduce`` / indexed ``list_sum``). Elements are cast
float->double before multiplying (exact), all arithmetic in double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def lit_doubles(values) -> Column:
    """Literal ``array<double>`` with cheap construction.

    ``F.lit([...])`` expands Python-side to one py4j round trip per
    element — a 64-dim centroid costs 64 calls, and the ANN plan
    builders inline dozens of such vectors, making DataFrame
    CONSTRUCTION (not execution) a dominant per-query cost. The
    ndarray path hands the whole vector to the JVM in one call and
    yields the same folded ``Literal`` node, bit-identical values
    (Python floats ARE IEEE float64). An expr-string
    ``array(1.5D, ...)`` form is NOT equivalent: it parses to a
    dim-wide CreateArray tree whose analysis costs ~2 s per plan."""
    import numpy as np

    return F.lit(np.asarray(list(values), dtype=np.float64))


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm (instead
    of an ANSI division-by-zero error)."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def sign_bits(v: Column, n_bits: int) -> Column:
    """Sign-quantization sketch of the first ``n_bits`` dimensions —
    '1' where v[i] >= 0 else '0', as a compact string bucket key.

    Sign quantization by fixed coordinate axes is a valid (if crude)
    LSH family for cosine similarity: vectors with high cosine agree on
    most signs. Used to pre-bucket near-duplicate search so the
    pairwise join is per-bucket instead of all-pairs.
    """
    bits = F.transform(
        F.slice(v, 1, n_bits),
        lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.array_join(bits, "")


def dim_stats(emb, vec_col: str = "embedding"):
    """Per-dimension feature statistics over an embedding corpus
    (min / max / mean / count) — the profiling pass before feature
    scaling or quantization.

    ``posexplode`` is map-only (one row per component, no shuffle
    until the per-dim groupBy, whose key count == the dimensionality —
    model-parameter scale). The mean sums through DECIMAL so it is
    order-independent; components are cast to double FIRST so min/max
    compare the same values both engines see."""
    from pyspark.sql import functions as F

    ex = emb.select(F.posexplode(vec_col).alias("dim", "x0")).select(
        "dim", F.col("x0").cast("double").alias("x")
    )
    return ex.groupBy("dim").agg(
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        # + 0.0: signed-zero normalization for near-zero negative means
        (
            F.round(
                F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_x"),
        F.count(F.lit(1)).alias("n"),
    )


def quantize_int8(emb, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Symmetric per-dimension int8 quantization of an embedding
    corpus — the 4x storage/bandwidth cut applied before shipping
    vectors to an ANN index or a training job. ``scale_d =
    max(|x_d|)/127`` per dimension, ``q = floor(x/scale + 0.5)`` (the
    explicit half-up form, identical in Spark and DuckDB where their
    ``round()`` tie rules differ), so q ∈ [-127, 127] exactly.

    Shape: ``posexplode`` is map-only; the per-dim max-abs groupBy has
    dimensionality-many keys (model-parameter scale) and broadcasts
    back onto the flat stream — one shuffle of dim-sized data total,
    nothing collected. Output is per-component rows (vec_id, dim, q)
    so every cell is a scalar the parity harness canonicalizes, and so
    downstream repacking (``collect_list`` ordered by dim) stays a
    per-vector local sort.

    A floor(1e-30) on the scale makes an all-zero dimension quantize
    to zeros instead of raising/NULLing on division — and keeps the
    expression engine-agnostic (Spark and DuckDB disagree on
    double/0)."""
    from pyspark.sql import functions as F

    flat = emb.select(
        F.col(id_col), F.posexplode(vec_col).alias("dim", "v0")
    ).select(id_col, "dim", F.col("v0").cast("double").alias("v"))
    scales = flat.groupBy("dim").agg(
        (F.greatest(F.max(F.abs(F.col("v"))), F.lit(1e-30)) / F.lit(127.0)).alias(
            "scale"
        )
    )
    return flat.join(F.broadcast(scales), "dim").select(
        id_col,
        F.col("dim").cast("int").alias("dim"),
        F.floor(F.col("v") / F.col("scale") + F.lit(0.5)).cast("int").alias("q"),
    )


def jl_signs(out_dim: int = 16, in_dim: int = 64) -> list[list[float]]:
    """Deterministic Rademacher (+/-1) projection matrix for
    Johnson-Lindenstrauss dimensionality reduction: sign(j, k) from
    the parity of the first hex digit of md5("j:k"). Computed once
    driver-side (model-parameter scale: out_dim x in_dim floats) and
    inlined as literals into BOTH the Spark plan and the DuckDB twin,
    so the two engines share one matrix by construction."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{j}:{k}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for k in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def jl_project(emb, vec_col: str = "embedding", id_col: str = "vec_id",
               out_dim: int = 16, in_dim: int = 64):
    """JL random projection to ``out_dim`` dims (sparse-free
    Rademacher variant: proj_j = sum_k x_k * s_jk / sqrt(out_dim),
    the scale that makes E[||proj||^2] = ||x||^2) — the
    shrink-before-ANN step that keeps pairwise distances within
    (1 +/- eps) while cutting vector bytes 4x.

    Map-only: each output component is one ``zip_with`` + left-fold
    ``aggregate`` over the row's own vector against a LITERAL sign
    array — no join, no shuffle, no UDF; the plan scales
    embarrassingly and composes with scan pruning. The fold is
    left-to-right from 0.0 (bit-neutral vs DuckDB's list_reduce, the
    kmeans-oracle precedent), output rounded to 6 dp per the
    repo-wide cross-engine rule; per-component rows keep every cell
    scalar for the parity harness."""
    from pyspark.sql import functions as F

    signs = jl_signs(out_dim, in_dim)
    vd = _to_double(F.col(vec_col))
    scale = float(out_dim) ** 0.5
    comps = [
        F.aggregate(
            F.zip_with(
                vd,
                F.array(*[F.lit(s) for s in signs[j]]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for j in range(out_dim)
    ]
    return emb.select(
        F.col(id_col), F.posexplode(F.array(*comps)).alias("odim", "raw")
    ).select(
        id_col,
        F.col("odim").cast("int").alias("odim"),
        # + 0.0 normalizes a rounded -0.0 to +0.0: Spark's HALF_UP
        # round returns +0.0 for tiny negatives where DuckDB keeps the
        # sign, and the parity hash distinguishes repr(-0.0)
        (F.round(F.col("raw") / F.lit(scale), 6) + F.lit(0.0)).alias("val"),
    )


def energy_profile(emb, prefix_dims=(8, 16, 32, 64), vec_col="embedding"):
    """Matryoshka-style truncation profile: for each candidate prefix
    length d, the corpus-mean fraction of a vector's squared norm that
    the first d components capture — the number you read before
    truncating stored embeddings to d dims (MRL-trained embeddings
    front-load energy; flat profiles mean truncation loses recall).

    Per row the ratio is ``dot(v[:d], v[:d]) / dot(v, v)`` with the
    same left-fold association both engines use (zero-norm vectors
    contribute 0.0); ratios are 12-dp-rounded and summed through
    DECIMAL so the mean is partitioning-independent. One map-only pass
    computes every prefix (the prefixes are slices of one row — no
    re-scan per d), then a dims-sized aggregation."""
    from pyspark.sql import functions as F

    full = dot(F.col(vec_col), F.col(vec_col))
    ratios = [
        F.when(full == 0, F.lit(0.0)).otherwise(
            dot(
                F.slice(F.col(vec_col), 1, d), F.slice(F.col(vec_col), 1, d)
            )
            / full
        )
        for d in prefix_dims
    ]
    flat = emb.select(
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(int(d)) for d in prefix_dims]),
                F.array(*[F.round(r, 12) for r in ratios]),
            )
        ).alias("prefix_dim", "r")
    )
    return flat.groupBy(F.col("prefix_dim").cast("int").alias("prefix_dim")).agg(
        F.round(
            F.sum(F.col("r").cast("decimal(26,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_energy"),
        F.count(F.lit(1)).alias("n"),
    )


def standardize_dims(emb, vec_col="embedding", id_col="vec_id"):
    """Per-dimension z-score standardization of an embedding corpus —
    the feature-scaling pass before distance-based work when
    dimensions carry different scales. ``z = (x - mean_d) / sd_d``
    per component, NULL where a dimension is constant (sd 0 — the
    nullif guard both engines share instead of an ANSI
    divide-by-zero).

    Shape: ``posexplode`` is map-only; the per-dim moment aggregation
    has dimensionality-many keys (model-parameter scale, DECIMAL-exact
    sums of x and x² so mean/sd are partitioning-independent) and
    joins back onto the flat stream — one shuffle of dim-sized data
    total. Output is per-component rows (vec_id, dim, z), 6-dp-rounded
    with signed-zero normalization."""
    from pyspark.sql import functions as F

    flat = emb.select(
        F.col(id_col), F.posexplode(vec_col).alias("dim", "x0")
    ).select(id_col, "dim", F.col("x0").cast("double").alias("x"))
    st = flat.groupBy("dim").agg(
        F.sum(F.col("x").cast("decimal(28,12)")).cast("double").alias("s"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,12)"))
        .cast("double")
        .alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    m = st.select(
        "dim",
        F.expr("s / n").alias("mean"),
        F.expr("sqrt(greatest(s2 / n - (s / n) * (s / n), 0.0))").alias("sd"),
    )
    return flat.join(F.broadcast(m), "dim").select(
        id_col,
        F.col("dim").cast("int").alias("dim"),
        (
            F.round(
                (F.col("x") - F.col("mean")) / F.expr("nullif(sd, 0.0)"), 6
            )
            + F.lit(0.0)
        ).alias("z"),
    )
