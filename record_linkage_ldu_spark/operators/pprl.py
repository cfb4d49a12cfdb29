"""Privacy-preserving record linkage (PPRL): CLK Bloom-filter
encodings + Dice-coefficient matching.

Schnell, Bachteler & Reiher, "Privacy-preserving record linkage using
Bloom filters" (BMC Med Inform Decis Mak 2009): each party encodes a
quasi-identifier as a fixed-size Bloom filter over its character
q-grams and shares ONLY the bit vectors; the linkage unit scores
candidate pairs with the Dice coefficient of the encodings — similar
strings share most of their q-grams, so their filters share most of
their set bits, while the raw values never leave the data owner.
This is the standard protocol when two organizations must link
records they are not allowed to show each other (the reference's
LDU x HW cross-linkage, under a privacy constraint).

Engine mapping: an encoding is the SET of set bit positions
(``(doc_id, pos)`` rows — the sparse form; the dense bitmap is a
presentation detail), built with deterministic md5 double-hashing so
the DuckDB oracle reproduces it bit-for-bit.  Dice over candidate
pairs is the same keyed-join shape as the TF-IDF dot product: explode
once, join per pair side on (doc_id, pos), one groupBy — no UDF, no
driver materialization, and the encoding table is exactly the
artifact a real PPRL deployment persists and exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_encode(
    records: DataFrame,
    field: str = "name",
    m_bits: int = 256,
    n_hashes: int = 2,
    q: int = 2,
) -> DataFrame:
    """CLK encoding: field -> set bit positions.

    Each padded q-gram g sets ``n_hashes`` positions
    ``md5(h || ':' || g) mod m_bits`` (double-hashing with the hash
    index folded into the digest input — deterministic, engine-
    portable, and exactly reproducible in the DuckDB twin).  Output:
    ``(doc_id, pos int)``, distinct — the sparse encoding table.
    Records whose field is NULL/empty produce no rows (nothing to
    encode; Dice treats them as similarity 0).

    Scale shape: one narrow projection + one explode + distinct
    keyed on (doc_id, pos).  m_bits bounds rows per record at
    ``n_hashes * (len+1)`` — single-digit dozens for name fields.
    """
    padded = F.concat(F.lit("#"), F.lower(F.trim(F.col(field))), F.lit("$"))
    # length >= q guards sequence(1, N<1): Spark yields a DESCENDING
    # [1, 0] there (spurious grams) where the DuckDB twin's range() is
    # empty — too-short fields must produce no encoding in BOTH engines.
    base = records.select(
        "doc_id", padded.alias("_p")
    ).where(F.length("_p") >= max(3, q))  # '#$' alone = empty field
    grams = base.select(
        "doc_id",
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(1, length(_p) - {q - 1}), "
                f"i -> substring(_p, i, {q})))"
            )
        ).alias("gram"),
    )
    pos_cols = [
        F.pmod(
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{h}:"), F.col("gram"))), 1, 8), 16, 10).cast(
                "long"
            ),
            F.lit(m_bits),
        ).cast("int")
        for h in range(n_hashes)
    ]
    return (
        grams.select("doc_id", F.explode(F.array(*pos_cols)).alias("pos"))
        .dropDuplicates(["doc_id", "pos"])
    )


def dice_pairs(
    encodings: DataFrame,
    pairs: DataFrame,
    out_col: str = "dice",
    pin: bool = True,
) -> DataFrame:
    """Dice coefficient per candidate pair over CLK encodings:
    ``2 |A ∩ B| / (|A| + |B|)``.

    One row per input pair; a pair where either side has no encoding
    scores 0.0.  Scale shape: per-doc cardinalities = one groupBy;
    intersection = two equi-joins keyed on (doc_id, pos) + one pair
    groupBy — identical cost class to the TF-IDF dot product.

    ``pin`` localCheckpoints the encoding table once: it is referenced
    three times below (sizes, both join sides), and an unmaterialized
    `bloom_encode` plan would re-run its explode+md5+distinct per
    reference.  In a real PPRL deployment the encodings arrive as a
    persisted table and the pin is a no-op cost.
    """
    from .dedup import _pin

    encodings = _pin(encodings.select("doc_id", "pos"), pin)
    sizes = encodings.groupBy("doc_id").agg(
        F.count("*").cast("double").alias("n_bits")
    )
    e1 = encodings.select(
        F.col("doc_id").alias("doc_id_1"), "pos"
    )
    e2 = encodings.select(
        F.col("doc_id").alias("doc_id_2"), "pos"
    )
    inter = (
        pairs.select("doc_id_1", "doc_id_2")
        .join(e1, "doc_id_1")
        .join(e2, ["doc_id_2", "pos"])
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.count("*").cast("double").alias("n_inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc_id_1"), F.col("n_bits").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("doc_id_2"), F.col("n_bits").alias("n2"))
    return (
        pairs.select("doc_id_1", "doc_id_2")
        .join(inter, ["doc_id_1", "doc_id_2"], "left")
        .join(s1, "doc_id_1", "left")
        .join(s2, "doc_id_2", "left")
        .select(
            "doc_id_1",
            "doc_id_2",
            F.round(
                F.when(
                    F.col("n1").isNotNull() & F.col("n2").isNotNull(),
                    2.0
                    * F.coalesce(F.col("n_inter"), F.lit(0.0))
                    / (F.col("n1") + F.col("n2")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias(out_col),
        )
    )


def sql_bloom_dice(
    norm_chain: str,
    pairs_cte: str = "pairs",
    field: str = "name",
    m_bits: int = 256,
    n_hashes: int = 2,
    q: int = 2,
    out_col: str = "dice",
) -> str:
    """DuckDB twin of :func:`bloom_encode` + :func:`dice_pairs` over
    the oracle chain's ``norm`` and candidate ``pairs`` CTEs."""
    pos_exprs = " , ".join(
        f"(('0x' || substr(md5('{h}:' || gram), 1, 8))::UBIGINT % {m_bits})"
        for h in range(n_hashes)
    )
    return f"""
        {norm_chain},
        padded AS (
            SELECT doc_id, '#' || lower(trim("{field}")) || '$' AS _p
            FROM norm
            WHERE length('#' || lower(trim("{field}")) || '$') > 2
        ),
        grams AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, length(_p) - {q - 2}),
                       i -> substr(_p, CAST(i AS INT), {q})))) AS gram
            FROM padded
        ),
        enc AS MATERIALIZED (
            -- referenced 3x (sizes + both join sides); DuckDB inlines
            -- CTEs per reference, so unhinted the md5 explode ran 3x
            SELECT DISTINCT doc_id, CAST(pos AS INT) AS pos
            FROM grams, unnest([{pos_exprs}]) AS t(pos)
        ),
        sizes AS (
            SELECT doc_id, CAST(count(*) AS DOUBLE) AS n_bits
            FROM enc GROUP BY doc_id
        ),
        inter AS (
            SELECT p.doc_id_1, p.doc_id_2,
                   CAST(count(*) AS DOUBLE) AS n_inter
            FROM {pairs_cte} p
            JOIN enc a ON a.doc_id = p.doc_id_1
            JOIN enc b ON b.doc_id = p.doc_id_2 AND b.pos = a.pos
            GROUP BY 1, 2
        )
        SELECT p.doc_id_1, p.doc_id_2,
               round(CASE WHEN s1.n_bits IS NOT NULL
                           AND s2.n_bits IS NOT NULL
                     THEN 2.0 * coalesce(i.n_inter, CAST(0 AS DOUBLE))
                          / (s1.n_bits + s2.n_bits)
                     ELSE CAST(0 AS DOUBLE) END, 6) AS {out_col}
        FROM {pairs_cte} p
        LEFT JOIN inter i
          ON i.doc_id_1 = p.doc_id_1 AND i.doc_id_2 = p.doc_id_2
        LEFT JOIN sizes s1 ON s1.doc_id = p.doc_id_1
        LEFT JOIN sizes s2 ON s2.doc_id = p.doc_id_2
    """
