"""Round-9 operators: perceptual-hash (dHash) image near-dup dedup."""

from __future__ import annotations

import itertools

import pytest

from yaml_pipe_spark.multimodal.phash import (
    GRID_X,
    GRID_Y,
    H,
    STRIDE,
    W,
    _pixel_bytes,
    build_phash_bmp,
    dhash_bands,
)


def _reference_bands(doc_id: int) -> list[int]:
    """Independent dHash recomputation STRAIGHT from the pixel formula —
    no BMP encode/decode in the loop, so a stride, offset, or row-order
    bug in either build_phash_bmp or dhash_bands breaks parity."""
    base, v = doc_id // 4, doc_id % 4

    def gray(x_img: int, y_img: int) -> int:
        r = H - 1 - y_img
        p = r * W + x_img
        pert = 128 if (r < 2 and p % 4 < v) else 0
        return sum((b + pert) % 256 for b in _pixel_bytes(base, p)) // 3

    grid = [
        [gray(x * W // GRID_X, y * H // GRID_Y) for x in range(GRID_X)]
        for y in range(GRID_Y)
    ]
    bits = [
        1 if grid[y][x + 1] > grid[y][x] else 0
        for y in range(GRID_Y)
        for x in range(GRID_X - 1)
    ]
    return [sum(bits[16 * j + p] << p for p in range(16)) for j in range(4)]


def _ham(a: list[int], b: list[int]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_dhash_roundtrip_matches_formula():
    for doc_id in range(0, 200):
        assert dhash_bands(build_phash_bmp(doc_id)) == _reference_bands(
            doc_id
        ), doc_id


def test_variants_confine_damage_to_band3():
    """The perturbation contract: variants touch only the two bottom
    stored rows = dHash bits 48..63, so bands 0-2 are bit-identical
    within a group (this is what guarantees band-join recall)."""
    for g in range(100):
        bands = [dhash_bands(build_phash_bmp(4 * g + v)) for v in range(4)]
        for i, j in itertools.combinations(range(4), 2):
            assert bands[i][:3] == bands[j][:3], (g, i, j)


def test_cross_group_images_are_far():
    import random

    rng = random.Random(7)
    hs = {d: dhash_bands(build_phash_bmp(d)) for d in range(200)}
    for _ in range(500):
        a, b = rng.sample(range(200), 2)
        if a // 4 != b // 4:
            assert _ham(hs[a], hs[b]) > 12, (a, b)


def test_dhash_rejects_non_bmp():
    with pytest.raises(ValueError, match="BMP"):
        dhash_bands(b"nope")


def test_bmp_is_well_formed():
    p = build_phash_bmp(123)
    assert p[:2] == b"BM"
    assert int.from_bytes(p[18:22], "little") == W
    assert int.from_bytes(p[22:26], "little") == H
    assert len(p) == 54 + STRIDE * H


def test_phash_pairs_end_to_end(spark):
    from pyspark.sql import functions as F

    from yaml_pipe_spark.multimodal.phash import (
        phash_bands,
        phash_near_dup_pairs,
    )

    docs = spark.range(0, 48).select(F.col("id").alias("doc_id"))
    bands = phash_bands(docs, "doc_id")
    pairs = phash_near_dup_pairs(bands, max_hamming=12).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    # every returned pair is (a) verified close and (b) correct vs the
    # reference hashes; all returned pairs here are same-group (cross
    # distances measured > 12 for this id range)
    hs = {d: _reference_bands(d) for d in range(48)}
    for (a, b), d in got.items():
        assert a // 4 == b // 4, (a, b)
        assert d == _ham(hs[a], hs[b])
        assert d <= 12
    # and every same-group pair whose true distance is <= threshold is
    # found (bands 0-2 intact -> always a candidate; no recall loss)
    for g in range(12):
        for i, j in itertools.combinations(range(4), 2):
            a, b = 4 * g + i, 4 * g + j
            if _ham(hs[a], hs[b]) <= 12:
                assert (a, b) in got, (a, b)


def test_phash_plan_is_arrow_and_no_cartesian(spark):
    from yaml_pipe_spark.multimodal.phash import (
        phash_bands,
        phash_near_dup_pairs,
    )
    from pyspark.sql import functions as F

    docs = spark.range(0, 64).select(F.col("id").alias("doc_id"))
    bands = phash_bands(docs, "doc_id")
    # the hashing itself is Arrow-batched executor-side Python...
    bplan = bands._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in bplan or "MapInPandas" in bplan
    # ...and the pair stage is a pure band equi-join (the localCheckpoint
    # inside phash_near_dup_pairs truncates lineage to an ExistingRDD scan,
    # which is exactly the point: the mapInPandas runs ONCE, not per
    # consumer)
    df = phash_near_dup_pairs(bands)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ExistingRDD" in plan


# ---------------------------------------------------------------------------
# distributed BPE merge training
# ---------------------------------------------------------------------------


def _py_bpe_train(texts: list[str], rounds: int):
    """Greedy single-process Sennrich reference."""
    import re
    from collections import Counter

    vocab = Counter(w for t in texts for w in re.findall("[a-z]+", t.lower()))
    syms = {w: list(w) for w in vocab}
    out = []
    for _ in range(rounds):
        pc = Counter()
        for w, c in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break  # pairs ran dry: both engines truncate the table here
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for w in syms:
            s, merged = syms[w], []
            for x in s:
                if merged and merged[-1] == best[0] and x == best[1]:
                    merged[-1] = best[0] + best[1]
                else:
                    merged.append(x)
            syms[w] = merged
        out.append(
            (best, pc[best], sum(c * len(syms[w]) for w, c in vocab.items()))
        )
    return out


def test_bpe_train_matches_greedy_reference(spark):
    from yaml_pipe_spark.operators.text_stats import bpe_train_merges

    texts = [
        "the then there and other another",
        "in the thin thing and sand",
        "banana bandana and an anthem",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = bpe_train_merges(df, rounds=6).orderBy("rank").collect()
    want = _py_bpe_train(texts, 6)
    assert len(rows) == 6
    for r, ((l, rr), cnt, tok) in zip(rows, want):
        assert (r.lft, r.rgt) == (l, rr), r
        assert r.pair_count == cnt
        assert r.tokens_after == tok
    # compression curve is monotone: each merge can only shrink the corpus
    toks = [r.tokens_after for r in rows]
    assert toks == sorted(toks, reverse=True)


def test_bpe_train_learned_table_feeds_encoder(spark):
    """The trained table is in exactly the format bpe_encode consumes:
    encoding with it reproduces the trainer's own final symbolization
    (token count after the last merge)."""
    import re
    from collections import Counter

    from yaml_pipe_spark.operators.text_stats import (
        bpe_encode,
        bpe_train_merges,
    )

    texts = ["the then there and other another", "in the thin thing and sand"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = bpe_train_merges(df, rounds=5).orderBy("rank").collect()
    merges = [(r.lft, r.rgt) for r in rows]
    vocab = Counter(
        w for t in texts for w in re.findall("[a-z]+", t.lower())
    )
    total = sum(c * len(bpe_encode(w, merges=merges)) for w, c in vocab.items())
    assert total == rows[-1].tokens_after
    # and the default pinned table still drives bpe_encode unchanged
    assert bpe_encode("the") == ["the"]


def test_bpe_encode_rejects_nothing_learned():
    from yaml_pipe_spark.operators.text_stats import bpe_encode

    # empty learned table = character fallback
    assert bpe_encode("abc", merges=[]) == ["a", "b", "c"]


def test_dhash_rejects_top_down_bmp():
    """Negative biHeight (top-down row order) must fail loudly — walking
    it bottom-up would silently hash a flipped image and miss its
    near-dups."""
    p = bytearray(build_phash_bmp(7))
    p[22:26] = (-H).to_bytes(4, "little", signed=True)
    with pytest.raises(NotImplementedError, match="top-down"):
        dhash_bands(bytes(p))


def test_bpe_train_property_random_corpora(spark):
    """Hypothesis-style sweep without per-example Spark jobs being too
    slow: a handful of adversarial corpora (repeated letters that force
    overlapping-count vs non-overlap-merge divergence, ties broken
    lexicographically, single-char words) against the greedy reference."""
    corpora = [
        ["aaaaa aaa aa", "aaaa aa"],          # overlap counting vs fold
        ["abab ababab", "baba bab"],          # alternating, tie-prone
        ["z y x w v u t s", "s t u v w x"],   # singletons only
        ["the the the", "thee them theme"],   # shared prefixes
        ["qq rr qq rr ss", "ss qq rr"],       # exact count ties
    ]
    for texts in corpora:
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        rows = (
            __import__("yaml_pipe_spark.operators.text_stats", fromlist=["x"])
            .bpe_train_merges(df, rounds=4)
            .orderBy("rank")
            .collect()
        )
        want = _py_bpe_train(texts, 4)
        got = [((r.lft, r.rgt), r.pair_count, r.tokens_after) for r in rows]
        assert got == want, (texts, got, want)
