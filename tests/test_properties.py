"""Randomized property pins (seeded, batch-evaluated in one Spark job
per property — per-example Spark round trips would be minutes).

Properties:
* date component derivation == Python datetime reference on random
  valid dates, and == sentinels on malformed input;
* condense keeps exactly one row per business key, the max technical
  key;
* merge keys = (active ∖ delta) ∪ upserts — deletes vanish, survivors
  untouched;
* partition_rel_path == the directory names Spark itself writes, for
  adversarial partition strings.
"""

from __future__ import annotations

import datetime
import os
import random

import pytest

from pyspark.sql import functions as F

from m3d_engine_spark.functions.dates import with_date_components
from m3d_engine_spark.operators.delta_load import condense, merge_delta
from m3d_engine_spark.sources.writers import partition_rel_path

SEED = 20260813


def test_date_components_match_python_reference(spark):
    rng = random.Random(SEED)
    cases = []
    for _ in range(300):
        if rng.random() < 0.15:
            cases.append("".join(rng.choice("abc123") for _ in range(rng.randint(0, 10))))
        else:
            d = datetime.date(2000, 1, 1) + datetime.timedelta(days=rng.randint(0, 11000))
            cases.append(d.strftime("%Y%m%d"))
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, d string")
    out = {
        r.i: (r.year, r.month, r.day, r.week)
        for r in with_date_components(df, "d", "yyyyMMdd", ["year", "month", "day", "week"]).collect()
    }
    for i, c in enumerate(cases):
        try:
            d = datetime.datetime.strptime(c, "%Y%m%d").date()
            expected = (d.year, d.month, d.day, (d.timetuple().tm_yday - 1) // 7 + 1)
        except ValueError:
            expected = (9999, 99, 99, 99)
        assert out[i] == expected, f"{c!r}: {out[i]} != {expected}"


def test_condense_keeps_max_technical_key(spark):
    rng = random.Random(SEED)
    rows = [
        (rng.randint(0, 40), rng.randint(0, 1000), rng.random())
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "bk int, tk int, v double")
    out = {r.bk: r.tk for r in condense(df, ["bk"], ["tk"]).collect()}
    expected = {}
    for bk, tk, _ in rows:
        expected[bk] = max(expected.get(bk, -1), tk)
    assert out == expected
    # exactly one row per key
    assert condense(df, ["bk"], ["tk"]).groupBy("bk").count().filter("count > 1").count() == 0


def test_merge_delta_key_algebra(spark):
    rng = random.Random(SEED)
    active_keys = set(rng.sample(range(1000), 300))
    delta_keys = set(rng.sample(range(1000), 150))
    deletes = {k for k in delta_keys if rng.random() < 0.4}
    active = spark.createDataFrame([(k, f"a{k}") for k in active_keys], "k int, v string")
    delta = spark.createDataFrame(
        [(k, f"d{k}", "D" if k in deletes else "N") for k in delta_keys],
        "k int, v string, recordmode string",
    )
    out = {r.k: r.v for r in merge_delta(active, delta, ["k"]).collect()}
    expected_keys = (active_keys - delta_keys) | (delta_keys - deletes)
    assert set(out) == expected_keys
    for k, v in out.items():
        assert v == (f"d{k}" if k in delta_keys else f"a{k}")


def test_partition_rel_path_matches_spark_for_adversarial_values(spark, tmp_path):
    values = ["plain", "with space", "a:b", "q=r", "pct%20", "uni_äöü", "semi;colon", "hash#tag"]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, tag string")
    out = str(tmp_path / "adv")
    df.write.partitionBy("tag").parquet(out)
    written = {d for d in os.listdir(out) if d.startswith("tag=")}
    computed = {partition_rel_path([("tag", v)]) for v in values}
    assert computed == written


def test_epoch_us_encodings_agree_on_random_timestamps(spark):
    """Property: for any µs-precision instant, the three accepted
    event-time encodings (TIMESTAMP, TIMESTAMP_NTZ, epoch-ns BIGINT)
    produce the SAME epoch_us — including instants whose ns value
    exceeds 2^53 (where a double round-trip would corrupt the µs)."""
    from pyspark.sql import types as T

    from m3d_engine_spark.functions.epoch import epoch_us

    rng = random.Random(7)
    epoch = datetime.datetime(1970, 1, 1)
    micros = [rng.randrange(0, 4_102_444_800_000_000) for _ in range(80)]
    dts = [epoch + datetime.timedelta(microseconds=us) for us in micros]

    ts = spark.createDataFrame(
        [(d,) for d in dts], T.StructType([T.StructField("c", T.TimestampType())])
    )
    ntz = spark.createDataFrame(
        [(d,) for d in dts], T.StructType([T.StructField("c", T.TimestampNTZType())])
    )
    ns = spark.createDataFrame(
        [(us * 1000,) for us in micros],
        T.StructType([T.StructField("c", T.LongType())]),
    )
    outs = [
        sorted(
            r[0]
            for r in df.select(
                epoch_us(F.col("c"), df.schema["c"].dataType)
            ).collect()
        )
        for df in (ts, ntz, ns)
    ]
    assert outs[0] == outs[1] == outs[2] == sorted(micros)


def test_hash_split_boundaries_and_exhaustiveness(spark):
    """Property: hash_split covers every row exactly once, matches a
    pure-Python md5 reimplementation, and respects the documented
    hex-string boundaries."""
    import hashlib

    from m3d_engine_spark.operators.sampling import hash_split, split_boundaries

    ids = list(range(500))
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {r["id"]: r["split"] for r in
           hash_split(df, "id", [0.5, 0.25, 0.25]).collect()}
    bounds = split_boundaries([0.5, 0.25, 0.25])
    assert bounds == ["80000000", "c0000000"]
    for i in ids:
        h = hashlib.md5(str(i).encode()).hexdigest()[:8]
        want = 0 if h < bounds[0] else (1 if h < bounds[1] else 2)
        assert got[i] == want, (i, h, got[i], want)


def test_gumbel_resample_matches_python_reference(spark):
    """The Gumbel top-n on random weights must equal a pure-Python
    re-derivation of key = log_w − ln(−ln(u)), u = (md5(id)[:8]+0.5)/2³²."""
    import hashlib
    import math

    from m3d_engine_spark.operators.selection import gumbel_resample

    rng = random.Random(SEED)
    rows = [(i, round(rng.uniform(-5, 5), 4)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, log_w double")
    got = sorted(r.doc_id for r in gumbel_resample(df, "doc_id", n=60).collect())

    def key(i: int, w: float) -> tuple:
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 0.5) / (1 << 32)
        return (round(w - math.log(-math.log(u)), 4), -i)

    want = sorted(i for i, w in sorted(rows, key=lambda t: key(*t), reverse=True)[:60])
    assert got == want


def test_dsir_weights_match_python_reference(spark):
    """dsir_log_weights on a random corpus == a pure-Python model with
    the same md5 bucketing, add-α smoothing, and fixed-point rounding."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    from m3d_engine_spark.operators.selection import dsir_log_weights

    rng = random.Random(SEED + 1)
    vocab = [f"w{j}" for j in range(50)]
    rows = []
    for i in range(120):
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
        rows.append((i, text, rng.random() < 0.4))
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    B, alpha = 32, 0.5
    got = {
        r.doc_id: r.log_w
        for r in dsir_log_weights(
            df, F.col("is_t"), "doc_id", "text", n_buckets=B, alpha=alpha
        ).collect()
    }

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B

    raw, tgt = Counter(), Counter()
    per_doc = defaultdict(Counter)
    for i, text, is_t in rows:
        for tok in text.split():
            b = bucket(tok)
            raw[b] += 1
            per_doc[i][b] += 1
            if is_t:
                tgt[b] += 1
    rtot, ttot = sum(raw.values()), sum(tgt.values())
    ratio = {
        b: round(
            (math.log((tgt.get(b, 0) + alpha) / (ttot + alpha * B))
             - math.log((raw[b] + alpha) / (rtot + alpha * B))) * 1_000_000
        )
        for b in raw
    }
    for i, _, _ in rows:
        wsum = sum(c * ratio[b] for b, c in per_doc[i].items())
        lw4 = (1 if wsum >= 0 else -1) * ((abs(wsum) + 50) // 100)
        assert got[i] == lw4 / 10000.0, (i, got[i], lw4 / 10000.0)


def test_transition_matrix_rows_are_distributions(spark):
    """Random event streams: per from_state, probabilities sum to ~1
    (4dp rounding slack) and counts equal a Python reference."""
    from collections import Counter

    from m3d_engine_spark.operators.markov import transition_matrix

    rng = random.Random(SEED)
    rows = []
    for u in range(40):
        for t in range(rng.randint(0, 12)):
            rows.append((u, t, rng.randint(0, 10_000),
                         rng.choice("abcde")))
    if not rows:
        rows = [(0, 0, 0, "a")]
    df = spark.createDataFrame(rows, "u long, t long, eid long, s string")
    got = {(r.from_state, r.to_state): (r.n, r.p) for r in
           transition_matrix(df, ["u"], "t", "s", tie_cols=["eid"]).collect()}

    ref = Counter()
    by_user = {}
    for u, t, eid, s in rows:
        by_user.setdefault(u, []).append((t, eid, s))
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            ref[(a, b)] += 1
    assert {k: v for k, (v, _) in got.items()} == dict(ref)
    from_totals = Counter()
    for (a, _), n in ref.items():
        from_totals[a] += n
    for (a, b), (n, p) in got.items():
        assert abs(p - n / from_totals[a]) < 5e-5


def test_kcore_is_subgraph_fixpoint(spark):
    """Random graphs: every returned node has degree >= k measured
    within the returned node set, and the result is a fixpoint (all
    peeling already finished — verified against a Python peeler)."""
    from m3d_engine_spark.operators.graph import kcore

    rng = random.Random(SEED + 1)
    edges = {(rng.randint(0, 25), rng.randint(0, 25)) for _ in range(80)}
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.degree for r in kcore(df, k=3, rounds=12).collect()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = set(adj)
    while True:
        drop = {v for v in nodes
                if len(adj[v] & nodes) < 3}
        if not drop:
            break
        nodes -= drop
    ref = {v: len(adj[v] & nodes) for v in nodes}
    assert got == ref


def test_benford_fractions_partition_unity(spark):
    """Any numeric column: obs fractions sum to 1 (±rounding) and
    counts partition the non-null non-zero rows."""
    from m3d_engine_spark.operators.reporting import benford_audit

    rng = random.Random(SEED + 2)
    vals = [rng.uniform(-1e6, 1e6) for _ in range(500)] + [None, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = benford_audit(df, "v").collect()
    assert sum(r.n for r in out) == 500
    assert abs(sum(r.obs_frac for r in out) - 1.0) < 1e-4
    assert abs(sum(r.benford_frac for r in out) - 1.0) < 1e-5


def test_mmr_picks_are_distinct_shortlist_members(spark):
    """Random embeddings: the k picks per query are distinct, drawn
    from the brute shortlist, and pick 1 equals the relevance top-1."""
    from m3d_engine_spark.operators.similarity import (
        brute_force_topk,
        mmr_diversify,
    )

    rng = random.Random(SEED + 3)
    corpus = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.filter(F.col("vec_id") % 20 == 0)
    sel = mmr_diversify(corpus, queries, "vec_id", "embedding",
                        shortlist=10, k=4).collect()
    short = {}
    for r in brute_force_topk(corpus, queries, "vec_id", "embedding",
                              k=10).collect():
        short.setdefault(r.query_id, {}).update({r.neighbor_id: r.rank})
    by_q = {}
    for r in sel:
        by_q.setdefault(r.query_id, []).append(r)
    for q, picks in by_q.items():
        ids = [p.neighbor_id for p in picks]
        assert len(ids) == len(set(ids)) == 4
        assert all(i in short[q] for i in ids)
        seed_pick = min(picks, key=lambda p: p.pick)
        assert short[q][seed_pick.neighbor_id] == 1


def test_viterbi_segmentation_properties():
    """Pure-kernel property sweep (no Spark): for random words and
    random piece score tables, the Viterbi parse (a) concatenates
    back to the word, (b) only uses known pieces or floor single
    chars, and (c) never scores below the all-singles parse (the
    fallback is always available, so the optimum can't be worse)."""
    from m3d_engine_spark.operators.tokenizer import _viterbi_segmenter

    rng = random.Random(SEED)
    alphabet = "abcd"
    for _ in range(200):
        pieces = {}
        for ch in alphabet:
            pieces[ch] = -rng.uniform(1.0, 5.0)
        for _ in range(rng.randint(0, 12)):
            ln = rng.randint(2, 4)
            p = "".join(rng.choice(alphabet) for _ in range(ln))
            pieces[p] = -rng.uniform(0.5, 8.0)
        seg = _viterbi_segmenter(pieces, max_piece_len=4, floor=-23.0)
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        parse = seg(word)
        assert "".join(parse) == word
        assert all(p in pieces or len(p) == 1 for p in parse)
        score = sum(pieces.get(p, -23.0) for p in parse)
        singles = sum(pieces.get(ch, -23.0) for ch in word)
        assert score >= singles - 1e-9


# ---------------------------------------------------------------- suffix tier


def _py_tokens(text: str) -> list[str]:
    t = text.strip()
    return t.split() if t else []


def _py_covered(toks: dict, L: int, min_occ: int, keep_canonical: bool):
    """Pure-Python ExactSubstr cover oracle: window -> occurrence list,
    canonical = min (doc, pos); covered positions per doc."""
    wins: dict = {}
    for i in sorted(toks):
        t = toks[i]
        for p in range(len(t) - L + 1):
            wins.setdefault(tuple(t[p : p + L]), []).append((i, p))
    covered = {i: set() for i in toks}
    for occs in wins.values():
        if len(occs) < min_occ:
            continue
        canon = min(occs) if keep_canonical else None
        for (i, p) in occs:
            if (i, p) != canon:
                covered[i].update(range(p, p + L))
    return covered


def _rand_corpus(rng, n_docs, vocab, max_len):
    return [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, max_len))))
        for i in range(n_docs)
    ]


@pytest.mark.slow
def test_exact_substr_matches_python_oracle_random(spark):
    """Random tiny-vocabulary corpora (repeats everywhere, adversarial
    overlaps) at several window lengths: the distributed
    prefix-doubling removal must equal an independent pure-Python
    reference — a stronger pin than the md5 twin, since the oracle
    shares NO code or hashing with either implementation."""
    import random as _random

    from m3d_engine_spark.operators.suffix import exact_substr_dedup

    rng = _random.Random(SEED)
    vocab = list("abcdefgh")
    for L in (3, 5, 8):
        docs = _rand_corpus(rng, 40, vocab, 25)
        toks = {i: _py_tokens(t) for i, t in docs}
        covered = _py_covered(toks, L, 2, keep_canonical=True)
        want = {}
        for i, t in toks.items():
            kept = [x for j, x in enumerate(t) if j not in covered[i]]
            want[i] = (" ".join(kept), len(t), len(t) - len(kept))
        df = spark.createDataFrame(docs, "doc_id int, text string")
        got = {
            r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
            for r in exact_substr_dedup(
                df, "doc_id", "text", span_tokens=L
            ).collect()
        }
        assert got == want, f"L={L}"


def test_exact_decontaminate_matches_python_oracle_random(spark):
    """Random train/probe splits over a tiny vocabulary: decontaminate
    removes exactly the train positions covered by probe windows —
    every occurrence, no canonical keeper."""
    import random as _random

    from m3d_engine_spark.operators.suffix import exact_decontaminate

    rng = _random.Random(SEED + 1)
    vocab = list("abcde")
    L = 4
    train = _rand_corpus(rng, 30, vocab, 20)
    probes = [(100 + i, t) for i, t in _rand_corpus(rng, 6, vocab, 15)]
    ttoks = {i: _py_tokens(t) for i, t in train}
    pwins = set()
    for _, t in probes:
        pt = _py_tokens(t)
        for p in range(len(pt) - L + 1):
            pwins.add(tuple(pt[p : p + L]))
    want = {}
    for i, t in ttoks.items():
        cov = set()
        for p in range(len(t) - L + 1):
            if tuple(t[p : p + L]) in pwins:
                cov.update(range(p, p + L))
        kept = [x for j, x in enumerate(t) if j not in cov]
        want[i] = (" ".join(kept), len(t), len(t) - len(kept))
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in exact_decontaminate(
            spark.createDataFrame(train, "doc_id int, text string"),
            "doc_id",
            "text",
            spark.createDataFrame(probes, "doc_id int, text string"),
            "doc_id",
            "text",
            span_tokens=L,
        ).collect()
    }
    assert got == want


def test_exact_substr_spans_matches_python_islands_random(spark):
    """Random corpora: reported spans equal the pure-Python maximal
    islands over every-occurrence covers."""
    import random as _random

    from m3d_engine_spark.operators.suffix import exact_substr_spans

    rng = _random.Random(SEED + 2)
    vocab = list("abcdef")
    L = 4
    docs = _rand_corpus(rng, 35, vocab, 22)
    toks = {i: _py_tokens(t) for i, t in docs}
    covered = _py_covered(toks, L, 2, keep_canonical=False)
    want = set()
    for i, cov in covered.items():
        for cp in sorted(cov):
            if cp - 1 not in cov:
                end = cp
                while end + 1 in cov:
                    end += 1
                want.add((i, cp, end, end - cp + 1))
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in exact_substr_spans(
            spark.createDataFrame(docs, "doc_id int, text string"),
            "doc_id",
            "text",
            span_tokens=L,
        ).collect()
    }
    assert got == want
