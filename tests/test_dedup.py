"""Dedup-family scale tiers: census/cap/salt over MinHash band
buckets, n-gram metadata blocks, and SimHash multi-probe bands.

The salt tier must be LOSSLESS (identical pairs to the plain join) and
the drop tier must only remove pairs of the degenerate mega-bucket.
SimHash multi-probe carries a pigeonhole recall guarantee: hamming <=
n_bands - 1 implies at least one untouched band, so recall vs brute
force is exactly 1.0 at max_hamming=3 with 4 bands.
"""

import pytest
from pyspark.sql import functions as F

from record_linkage_ldu_spark.operators import dedup


def _docs(spark, groups, filler=0):
    """groups = list of (prefix, n_variants): n_variants docs sharing a
    long common text with a distinct trailing token each (near-dups).
    filler adds singleton docs with unrelated texts."""
    rows = []
    for gi, (prefix, n) in enumerate(groups):
        base = " ".join(f"{prefix}{w}" for w in range(30))
        for v in range(n):
            rows.append((f"g{gi}-d{v:04d}", f"{base} variant{v}"))
    for i in range(filler):
        txt = " ".join(f"unique{i}w{j}" for j in range(25))
        rows.append((f"f-{i:04d}", txt))
    return spark.createDataFrame(rows, "doc_id string, text string")


def _pairs_set(df):
    return {
        (r["doc_id_1"], r["doc_id_2"]) for r in df.select(
            "doc_id_1", "doc_id_2"
        ).collect()
    }


def test_minhash_salt_tier_is_lossless(spark):
    # 40 docs share every band bucket (identical long prefix) -> with
    # cap 10 they land in the salt tier (10 < 40 <= 10*16)
    docs = _docs(spark, [("alpha", 40), ("beta", 6)], filler=20)
    plain = dedup.minhash_near_duplicates(
        docs, threshold=0.5, max_bucket_size=None
    )
    capped = dedup.minhash_near_duplicates(
        docs, threshold=0.5, max_bucket_size=10, salt_buckets=4
    )
    assert _pairs_set(plain) == _pairs_set(capped)
    assert len(_pairs_set(capped)) >= 40 * 39 // 2  # alpha group paired


def test_minhash_drop_tier_removes_only_megabucket(spark):
    # cap 2, drop factor 3 -> ceiling 6: the 40-doc bucket is dropped,
    # the 5-doc group (salt tier: 2 < 5 <= 6) survives losslessly
    docs = _docs(spark, [("alpha", 40), ("beta", 5)], filler=10)
    capped = dedup.minhash_near_duplicates(
        docs, threshold=0.5, max_bucket_size=2, salt_buckets=2,
        drop_factor=3,
    )
    got = _pairs_set(capped)
    beta = {p for p in got if p[0].startswith("g1-")}
    assert len(beta) == 5 * 4 // 2
    assert not any(p[0].startswith("g0-") for p in got)


def test_capped_bucket_pairs_census_reports_drops(spark):
    keys = spark.createDataFrame(
        [(f"d{i}", "mega") for i in range(50)]
        + [(f"d{i}", f"solo{i}") for i in range(50)],
        "doc_id string, block_key string",
    )
    pairs, dropped = dedup.capped_bucket_pairs(
        keys, max_bucket_size=2, salt_buckets=2, drop_factor=4
    )
    assert pairs.count() == 0  # mega dropped, solos are singletons
    drops = dropped.collect()
    assert len(drops) == 1 and drops[0]["block_key"] == "mega"
    assert drops[0]["block_size"] == 50


def test_ngram_jaccard_capped_matches_plain(spark):
    docs = _docs(spark, [("alpha", 30), ("beta", 4)], filler=15)
    # one hot block: all docs share lang 'en' except filler in 'xx'
    docs = docs.withColumn(
        "lang",
        F.when(F.col("doc_id").startswith("f-"), F.lit("xx")).otherwise(
            F.lit("en")
        ),
    )
    plain = dedup.ngram_jaccard_pairs(
        docs, block_cols=("lang",), threshold=0.3, max_block_size=None
    )
    capped = dedup.ngram_jaccard_pairs(
        docs, block_cols=("lang",), threshold=0.3, max_block_size=10,
        salt_buckets=4,
    )
    p, c = _pairs_set(plain), _pairs_set(capped)
    assert p == c
    # exactly-once emission from the triangle-salted tier: set equality
    # alone would mask duplicate rows (ngram_jaccard_pairs applies no
    # final dropDuplicates — the triangle scheme must emit each pair
    # exactly once)
    assert capped.count() == plain.count()
    # jaccard values survive the salted path bit-for-bit
    pv = {tuple(r) for r in plain.collect()}
    cv = {tuple(r) for r in capped.collect()}
    assert pv == cv


def test_ngram_null_block_cols_never_pair(spark):
    docs = spark.createDataFrame(
        [("a", "x y z w", None), ("b", "x y z w", None),
         ("c", "x y z w", "en"), ("d", "x y z w", "en")],
        "doc_id string, text string, lang string",
    )
    got = dedup.ngram_jaccard_pairs(
        docs, block_cols=("lang",), threshold=0.1, max_block_size=10
    )
    assert _pairs_set(got) == {("c", "d")}


@pytest.fixture(scope="module")
def sketch_corpus(spark):
    # near-dup groups + filler; sketches computed once
    docs = _docs(spark, [("alpha", 12), ("beta", 8)], filler=60)
    sk = dedup.simhash_sketch(docs).cache()
    sk.count()
    return sk


def _brute_hamming_pairs(sk_rows, max_hamming):
    out = set()
    for i in range(len(sk_rows)):
        for j in range(i + 1, len(sk_rows)):
            a, b = sk_rows[i], sk_rows[j]
            if bin((a["simhash"] ^ b["simhash"]) & ((1 << 64) - 1)).count(
                "1"
            ) <= max_hamming:
                p = tuple(sorted((a["doc_id"], b["doc_id"])))
                out.add(p)
    return out


def test_simhash_multiprobe_recall_is_total_at_guaranteed_hamming(
    spark, sketch_corpus
):
    rows = sketch_corpus.collect()
    want = _brute_hamming_pairs(rows, max_hamming=3)
    got = _pairs_set(
        dedup.simhash_near_duplicates(
            sketch_corpus, max_hamming=3, n_bands=4
        )
    )
    assert want, "fixture must contain hamming<=3 pairs"
    # pigeonhole: 4 disjoint 16-bit bands, <=3 differing bits -> one
    # band untouched -> candidate found.  Recall must be exactly 1.0.
    assert got == want


def test_minhash_with_census_surfaces_dropped_megabucket(spark):
    """A dropped mega-bucket is the MOST duplicated content — the keep
    list marks every member keep=1 with no pairs.  with_census=True
    must surface exactly which buckets were dropped so the decision is
    observable (ADVICE r2)."""
    docs = _docs(spark, [("alpha", 40), ("beta", 5)], filler=10)
    pairs, dropped = dedup.minhash_near_duplicates(
        docs, threshold=0.5, max_bucket_size=2, salt_buckets=2,
        drop_factor=3, with_census=True,
    )
    drops = dropped.collect()
    assert drops, "mega-bucket must be reported"
    # every dropped bucket exceeds the ceiling (cap 2 * factor 3), and
    # the alpha mega-bucket (a few docs may fall out of a band when a
    # variant shingle wins that band's min) dominates
    assert all(d["block_size"] > 6 for d in drops)
    assert max(d["block_size"] for d in drops) >= 35
    # and the keep list surfaces the same census
    keep, dropped2 = dedup.near_duplicate_keep_list(
        docs, threshold=0.5, with_census=True, max_bucket_size=2,
        salt_buckets=2, drop_factor=3,
    )
    assert dropped2.count() == len(drops)
    # dropped members pair nowhere -> all keep=1 (the documented trap)
    alpha_keep = keep.where(F.col("doc_id").startswith("g0-"))
    assert alpha_keep.where(F.col("keep") == 1).count() == 40


def test_simhash_with_census_default_empty(spark, sketch_corpus):
    pairs, dropped = dedup.simhash_near_duplicates(
        sketch_corpus, max_hamming=3, n_bands=4, with_census=True
    )
    assert dropped.count() == 0
    assert dropped.columns == ["block_key", "block_size"]


def test_minhash_xxhash_knob_equivalent_recall(spark):
    """hash_fn='xxhash64' (the production knob: one JVM hash per draw
    instead of a string-concat md5) is a different hash family, so the
    signatures differ — but collision statistics are the same, so the
    verified near-dup pairs on a fixture with clear structure must
    match the md5 path."""
    docs = _docs(spark, [("alpha", 8), ("beta", 6)], filler=30)
    md5_pairs = _pairs_set(
        dedup.minhash_near_duplicates(docs, threshold=0.5, hash_fn="md5")
    )
    xx_pairs = _pairs_set(
        dedup.minhash_near_duplicates(docs, threshold=0.5, hash_fn="xxhash64")
    )
    # exact-Jaccard verification makes both paths precision-1.0; the
    # fixture's near-dups (within-group pairs) must be recalled by both
    assert md5_pairs == xx_pairs
    assert len(md5_pairs) >= 8 * 7 // 2 + 6 * 5 // 2


def test_winnow_guarantee_shared_run_yields_shared_fingerprint(spark):
    """Winnowing guarantee [SIGMOD'03]: two docs sharing a token run
    of length >= k + w - 1 share at least one selected fingerprint —
    regardless of what surrounds the run."""
    k, w = 5, 4
    shared = " ".join(f"run{i}" for i in range(k + w - 1))  # exactly k+w-1
    docs = spark.createDataFrame(
        [
            ("a", f"left padding words {shared} and then a tail"),
            ("b", f"{shared} totally different trailing content here"),
            ("c", "no overlap with anything else at all in this one"),
        ],
        "doc_id string, text string",
    )
    pairs = dedup.winnow_near_duplicates(docs, k=k, w=w, min_shared=1)
    got = _pairs_set(pairs)
    assert ("a", "b") in got
    assert not any("c" in p for p in got)


def test_winnow_capped_matches_plain_with_counts(spark):
    """The tier path must preserve per-pair shared-fingerprint COUNTS
    (each tier emits a pair exactly once per shared key), not just the
    pair set."""
    docs = _docs(spark, [("alpha", 25), ("beta", 4)], filler=10)
    plain = dedup.winnow_near_duplicates(
        docs, k=3, w=2, min_shared=1, max_bucket_size=None
    )
    capped = dedup.winnow_near_duplicates(
        docs, k=3, w=2, min_shared=1, max_bucket_size=5, salt_buckets=3
    )
    pv = {tuple(r) for r in plain.collect()}
    cv = {tuple(r) for r in capped.collect()}
    assert pv == cv
    assert len(pv) >= 25 * 24 // 2  # alpha near-dups all found


def test_winnow_drop_tier_census(spark):
    docs = _docs(spark, [("alpha", 30)], filler=5)
    pairs, dropped = dedup.winnow_near_duplicates(
        docs, k=3, w=2, min_shared=1, max_bucket_size=2,
        salt_buckets=2, drop_factor=3, with_census=True,
    )
    assert dropped.count() > 0
    assert all(r["block_size"] > 6 for r in dropped.collect())


def test_simhash_capped_matches_uncapped(spark, sketch_corpus):
    plain = dedup.simhash_near_duplicates(
        sketch_corpus, max_hamming=6, n_bands=4, max_bucket_size=None
    )
    capped = dedup.simhash_near_duplicates(
        sketch_corpus, max_hamming=6, n_bands=4, max_bucket_size=5,
        salt_buckets=3,
    )
    assert _pairs_set(plain) == _pairs_set(capped)


def test_minhash_cross_equals_self_restricted_to_cross_pairs(spark):
    """The cross-corpus join is the self join filtered to cross pairs:
    same bands, same verify — splitting a corpus in two and running
    the cross variant must find exactly the self variant's
    opposite-side pairs (as unordered pairs), with no duplicates."""
    df = _docs(spark, [("alpha", 6), ("beta", 4)], filler=10)
    left = df.where(F.substring("doc_id", -1, 1).isin("0", "2", "4", "6", "8"))
    right = df.join(left, "doc_id", "left_anti")
    self_pairs = dedup.minhash_near_duplicates(df, threshold=0.5)
    cross = dedup.minhash_cross_near_duplicates(left, right, threshold=0.5)
    left_ids = {r["doc_id"] for r in left.select("doc_id").collect()}
    want = {
        tuple(sorted(p))
        for p in _pairs_set(self_pairs)
        if (p[0] in left_ids) != (p[1] in left_ids)
    }
    got_rows = cross.collect()
    got = {tuple(sorted((r["doc_id_1"], r["doc_id_2"]))) for r in got_rows}
    assert got == want and len(want) > 0
    # exactly-once emission (no cross-tier/multi-band duplicates)
    assert len(got_rows) == len(got)
    # sides are oriented: doc_id_1 always from left, doc_id_2 from right
    assert all(r["doc_id_1"] in left_ids for r in got_rows)
    assert all(r["doc_id_2"] not in left_ids for r in got_rows)


def test_minhash_cross_salt_tier_is_lossless(spark):
    """Tiny caps force every shared band through the replicate-left
    salted cross join; output must equal the untiered plain join
    row-for-row, and nothing reaches the drop census."""
    df = _docs(spark, [("gamma", 8)], filler=6)
    left = df.where(F.substring("doc_id", -1, 1).isin("0", "2", "4", "6", "8"))
    right = df.join(left, "doc_id", "left_anti")
    plain = dedup.minhash_cross_near_duplicates(
        left, right, threshold=0.5, max_bucket_size=None
    )
    salted, census = dedup.minhash_cross_near_duplicates(
        left, right, threshold=0.5,
        max_bucket_size=2, drop_factor=10**6, with_census=True,
    )
    assert census.count() == 0
    assert _pairs_set(salted) == _pairs_set(plain)
    assert salted.count() == plain.count()


def test_prefix_filter_exactness_vs_brute_force(spark):
    """The prefix + length filters are LOSSLESS: output equals the
    brute-force all-pairs Jaccard >= t set, exactly — including pairs
    whose only shared tokens are corpus-frequent (they must still meet
    in a prefix) and excluding length-incompatible pairs."""
    texts = [
        ("d01", "the quick brown fox jumps over the lazy dog"),
        ("d02", "the quick brown fox jumped over the lazy dog"),
        ("d03", "the quick brown fox jumps over a lazy dog"),
        ("d04", "lorem ipsum dolor sit amet consectetur"),
        ("d05", "lorem ipsum dolor sit amet elit"),
        ("d06", "completely unrelated words here entirely"),
        ("d07", "the the the the"),  # collapses to one distinct token
        ("d08", "the"),
        ("d09", ""),
        ("d10", "quick brown fox"),
    ]
    df = spark.createDataFrame(texts, "doc_id string, text string")
    t = 0.6
    got = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in dedup.prefix_filter_pairs(df, threshold=t).collect()
    }

    from record_linkage_ldu_spark.functions.text import tokens

    toks = df.select(
        "doc_id",
        F.array_distinct(tokens(F.coalesce("text", F.lit("")))).alias("g"),
    ).where(F.size("g") > 0)
    a, b = toks.alias("a"), toks.alias("b")
    brute = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in a.crossJoin(b)
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
            dedup.jaccard_col(F.col("a.g"), F.col("b.g")).alias("j"),
        )
        .where(F.round("j", 6) >= t)
        .collect()
    }
    assert brute, "fixture must plant at least one true near-dup pair"
    assert got == brute
    # identical singleton-token docs meet via their (frequent) token
    assert ("d07", "d08") in got


def test_prefix_filter_cross_equals_self_restricted(spark):
    """The cross join (union-df canonical order) finds exactly the
    self-join pairs that straddle the two sides: same corpus split in
    two, cross output == self output restricted to cross pairs."""
    texts = [
        (i, f"alpha beta gamma delta epsilon token{i % 4}")
        for i in range(12)
    ] + [
        (100 + i, "zeta eta theta iota kappa unique" + str(i))
        for i in range(4)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    t = 0.6
    self_pairs = {
        (r["doc_id_1"], r["doc_id_2"], r["jaccard"])
        for r in dedup.prefix_filter_pairs(df, threshold=t).collect()
    }
    left = df.where(F.col("doc_id") % 2 == 0)
    right = df.where(F.col("doc_id") % 2 != 0)
    cross = {
        # orient like the canonicalized self pair for comparison
        (min(r["doc_id_1"], r["doc_id_2"]),
         max(r["doc_id_1"], r["doc_id_2"]), r["jaccard"])
        for r in dedup.prefix_filter_cross_pairs(
            left, right, threshold=t
        ).collect()
    }
    expected = {
        (d1, d2, j) for (d1, d2, j) in self_pairs if (d1 % 2) != (d2 % 2)
    }
    assert expected, "fixture must produce at least one cross pair"
    assert cross == expected


def test_dedup_weights_mass_per_cluster(spark):
    """Each near-dup cluster contributes ~1 doc of mass at alpha=1;
    alpha=0 disables; alpha=0.5 interpolates."""
    from record_linkage_ldu_spark.operators.dedup import dedup_weights

    keep = spark.createDataFrame(
        [("a", "a", 1), ("b", "a", 0), ("c", "a", 0), ("d", "d", 1)],
        "doc_id string, canonical_id string, keep int",
    )
    out = {r["doc_id"]: r for r in dedup_weights(keep).collect()}
    assert out["a"]["cluster_size"] == 3
    assert out["a"]["weight"] == out["b"]["weight"] == round(1 / 3, 6)
    assert out["d"]["weight"] == 1.0
    mass = sum(r["weight"] for r in out.values())
    assert abs(mass - 2.0) < 1e-5  # 2 clusters -> 2 docs of mass
    flat = {r["doc_id"]: r["weight"]
            for r in dedup_weights(keep, alpha=0.0).collect()}
    assert set(flat.values()) == {1.0}
    half = {r["doc_id"]: r["weight"]
            for r in dedup_weights(keep, alpha=0.5).collect()}
    assert abs(half["a"] - 1 / 3**0.5) < 1e-6


def test_containment_catches_subdocument_dup_jaccard_misses(spark):
    """Doc A quoted wholesale inside a 5x-longer doc B: containment of
    A in B is ~1.0 while Jaccard is ~|A|/|B| — below any usable
    resemblance threshold.  Directionality must point at the quoted
    side, and an unrelated doc must not pair."""
    quoted = " ".join(f"quote{w}" for w in range(30))
    wrapper = (
        " ".join(f"pre{w}" for w in range(60))
        + " " + quoted + " "
        + " ".join(f"post{w}" for w in range(60))
    )
    other = " ".join(f"noise{w}" for w in range(40))
    df = spark.createDataFrame(
        [("A", quoted, "en"), ("B", wrapper, "en"), ("C", other, "en")],
        "doc_id string, text string, lang string",
    )
    out = {
        (r["doc_id_1"], r["doc_id_2"]): r
        for r in dedup.containment_pairs(
            df, block_cols=("lang",), n=3, threshold=0.8
        ).collect()
    }
    assert set(out) == {("A", "B")}
    r = out[("A", "B")]
    assert r["containment_1"] == 1.0          # all of A's grams in B
    assert r["containment_2"] < 0.3           # B mostly not in A
    assert r["overlap"] == 1.0
    # Jaccard over the same grams misses it at the same threshold
    jac = dedup.ngram_jaccard_pairs(
        df, block_cols=("lang",), n=3, threshold=0.8
    )
    assert jac.count() == 0


def test_containment_salt_tier_is_lossless(spark):
    """Tiered (hot-block) containment emits exactly the plain-join
    pairs with identical measures."""
    df = _docs(spark, [("x", 12), ("y", 4)], filler=6).withColumn(
        "lang", F.lit("en")
    )
    plain = dedup.containment_pairs(
        df, block_cols=("lang",), n=3, threshold=0.3,
        max_block_size=None,
    )
    tiered = dedup.containment_pairs(
        df, block_cols=("lang",), n=3, threshold=0.3,
        max_block_size=5, salt_buckets=4, drop_factor=100,
    )
    rows = lambda d: {  # noqa: E731
        (r["doc_id_1"], r["doc_id_2"], r["containment_1"],
         r["containment_2"], r["overlap"])
        for r in d.collect()
    }
    assert rows(plain) == rows(tiered)
    assert len(rows(plain)) > 0


def test_prefix_filter_shingle_unit_and_minhash_recall_shape(spark):
    """unit='shingle' runs the same lossless prefix machinery over the
    minhash shingle universe: output equals brute-force shingle
    Jaccard >= t exactly.  On that shared universe, minhash candidates
    (exact-verified) are a SUBSET of the prefix ground truth —
    precision 1.0, recall = hits/exact — the minhash_recall contract."""
    texts = [
        ("1", "alpha beta gamma delta epsilon zeta eta theta"),
        ("2", "alpha beta gamma delta epsilon zeta eta iota"),
        ("3", "alpha beta gamma delta epsilon zeta eta theta"),
        ("4", "one two three four five six seven eight nine"),
        ("5", "totally different words appear in this document"),
        ("6", "xi"),
    ]
    df = spark.createDataFrame(texts, "doc_id string, text string")
    t = 0.5
    got = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in dedup.prefix_filter_pairs(
            df, threshold=t, unit="shingle"
        ).collect()
    }
    from record_linkage_ldu_spark.functions.text import (
        shingles_of_tokens,
        tokens,
    )

    sh = df.select(
        "doc_id",
        shingles_of_tokens(tokens(F.coalesce("text", F.lit(""))), 3).alias(
            "g"
        ),
    ).where(F.size("g") > 0)
    a, b = sh.alias("a"), sh.alias("b")
    brute = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in a.crossJoin(b)
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
            dedup.jaccard_col(F.col("a.g"), F.col("b.g")).alias("j"),
        )
        .where(F.round("j", 6) >= t)
        .collect()
    }
    assert brute, "fixture must plant shingle-level near-dups"
    assert got == brute
    assert ("1", "3") in got           # identical docs
    # minhash (same universe, same threshold): subset of ground truth
    approx = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in dedup.minhash_near_duplicates(df, threshold=t).collect()
    }
    assert approx <= got               # precision 1.0 by construction


def test_char_ngram_tokenizer_catches_cjk_pairs_word_misses(spark):
    """VERDICT r4 item 6: the word tokenizer's `[^a-z0-9]+` split
    deletes CJK text outright (empty shingle set -> NULL signature ->
    no band collisions), so a planted CJK near-dup pair is invisible
    to the default path and caught under tokenizer="char".  Latin
    near-dups are caught under BOTH tokenizers."""
    rows = [
        ("ja1", "今日は良い天気ですね。公園へ散歩に行きましょう。途中でお茶を買いましょう。"),
        ("ja2", "今日は良い天気ですね。公園へ散歩に行きましょう。途中で珈琲を買いましょう。"),
        ("en1", "the quick brown fox jumps over the lazy dog near the river bank today"),
        ("en2", "the quick brown fox jumps over the lazy dog near the river bank tonight"),
        ("ko1", "완전히 다른 내용의 문서입니다 중복이 전혀 없습니다"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")

    def pairs(**kw):
        return {
            (r["doc_id_1"], r["doc_id_2"])
            for r in dedup.minhash_near_duplicates(
                df, threshold=0.3, **kw
            ).collect()
        }

    word = pairs()  # default word shingles
    char = pairs(shingle_size=5, tokenizer="char")
    assert ("ja1", "ja2") not in word          # deleted by the splitter
    assert ("ja1", "ja2") in char              # caught under the knob
    assert ("en1", "en2") in word and ("en1", "en2") in char
    # the distinct Korean doc pairs with nothing either way
    assert not any("ko1" in p for p in word | char)
    # unknown knob value is refused, not silently worded
    with pytest.raises(ValueError, match="tokenizer"):
        dedup.minhash_near_duplicates(df, tokenizer="bpe").collect()


def test_empty_sketch_docs_never_pair_across_families(spark):
    """r5 weld-bug class (found by the CJK contrast test, then audited
    across families): docs whose sketch-unit set is EMPTY — whitespace
    or punctuation-only text, or any unsegmented non-Latin text under
    the word tokenizer — must never pair.  Before the fix, minhash
    banded them through concat_ws null-skipping, ngram/containment
    verified them at J(set(), set())=1.0 inside shared metadata
    blocks, and simhash sketched them all to 0 (hamming-0 "dupes"),
    each with zero content evidence."""
    rows = [
        ("1", "!!! ...", "en", 10),
        ("2", "???", "en", 10),
        ("3", "这是一段没有空格的中文文本", "en", 10),
        ("4", "real english words appear here twice over " * 3, "en", 10),
        # identical twin: inside every family's catch radius (simhash
        # hamming 0; the near-miss radius is each family's own test)
        ("5", "real english words appear here twice over " * 3, "en", 10),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, text string, lang string, n_chars long"
    )
    empty_ids = {"1", "2", "3"}

    mh = dedup.minhash_near_duplicates(df, threshold=0.3).collect()
    ng = dedup.ngram_jaccard_pairs(
        df, block_cols=("lang",), n=1, threshold=0.5
    ).collect()
    ct = dedup.containment_pairs(
        df, block_cols=("lang",), n=3, threshold=0.6
    ).collect()
    sh = dedup.simhash_near_duplicates(
        dedup.simhash_sketch(df), max_hamming=3, n_bands=4
    ).collect()
    for name, pairs in (
        ("minhash", mh), ("ngram", ng), ("containment", ct), ("simhash", sh)
    ):
        ids = {r["doc_id_1"] for r in pairs} | {r["doc_id_2"] for r in pairs}
        assert not (ids & empty_ids), (name, pairs)
        # the real near-dup pair is still caught
        assert ("4", "5") in {
            (r["doc_id_1"], r["doc_id_2"]) for r in pairs
        }, name
