"""Vectorized checkpoint pruning (operators/ckpt.py) vs the dict
evaluator (VersionedLake._file_may_match) — the semantics reference.

Contract: the vector keep-set may keep MORE files than the dict path
(conservative degradation is legal — scan() always applies the residual
filter) but must NEVER drop a file the dict path keeps, and on the
designed cases it must prune exactly as well.  No Spark session needed:
both evaluators run on plain stats structures."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import types as T

from df_to_azure_spark.operators.ckpt import (
    ckpt_advance,
    ckpt_from_bytes,
    ckpt_from_dicts,
    ckpt_to_bytes,
    vector_keep_rels,
)
from df_to_azure_spark.operators.manifest import VersionedLake

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("flag", T.StringType()),
        T.StructField("country", T.StringType()),
    ]
)
TYPES = {f.name: f.dataType for f in SCHEMA.fields}


def _rand_stats(rng: random.Random, partitioned: bool):
    """One file's stats entry, randomly degenerate in the ways the
    encoder produces: missing columns, all-null columns, zero rows,
    dict value sets, hive-null partitions."""
    rows = rng.choice([0, 10, 100])
    cols = {}
    if rng.random() < 0.9:
        lo = rng.randint(-50, 50)
        cols["id"] = {"mn": lo, "mx": lo + rng.randint(0, 40), "nl": rng.choice([0, 3])}
    if rng.random() < 0.8:
        lo = rng.uniform(-5, 5)
        cols["x"] = {"mn": lo, "mx": lo + rng.random() * 4, "nl": 0}
    r = rng.random()
    if r < 0.6:
        a, b = sorted(
            rng.choice(["a", "cc", "m", "zz", "k" * 64]) for _ in range(2)
        )
        cols["s"] = {"mn": a, "mx": b, "nl": rng.choice([0, 2])}
    elif r < 0.75:
        cols["s"] = {"mn": None, "mx": None, "nl": rows}  # all-null
    if rng.random() < 0.7:
        vals = sorted(
            set(rng.choice(["AA", "BB", "CC", "DD"]) for _ in range(3))
        )
        cols["flag"] = {
            "mn": vals[0],
            "mx": vals[-1],
            "nl": 0,
            "vals": vals if rng.random() < 0.8 else None,
        }
        if cols["flag"]["vals"] is None:
            del cols["flag"]["vals"]
    st = {"rows": rows, "cols": cols}
    if partitioned:
        st["part"] = {
            "country": rng.choice(["NL", "DE", "a%3Ab", "__HIVE_DEFAULT_PARTITION__"])
        }
    return st


def _rand_pred(rng: random.Random):
    col = rng.choice(["id", "x", "s", "flag", "country", "ghost"])
    op = rng.choice(
        ["=", "!=", "<", "<=", ">", ">=", "between", "in", "is_null",
         "is_not_null", "starts_with"]
    )
    if op in ("is_null", "is_not_null"):
        return (col, op, None)
    if op == "starts_with":
        return (col, op, rng.choice(["a", "c", "k", "zz", "N", "k" * 70]))
    if col == "id":
        v = rng.choice([rng.randint(-60, 60), rng.uniform(-60, 60), "oops"])
    elif col == "x":
        v = rng.choice([rng.uniform(-8, 8), rng.randint(-8, 8)])
    elif col in ("s", "flag"):
        v = rng.choice(["AA", "BB", "m", "zz", "k" * 300, 7])
    else:
        v = rng.choice(["NL", "DE", "a:b", 3])
    if op == "between":
        try:
            lo, hi = sorted([v, v]) if rng.random() < 0.3 else sorted(
                [v, rng.choice([v, v])]
            )
        except TypeError:
            lo, hi = v, v
        return (col, op, (lo, hi))
    if op == "in":
        return (col, op, (v, v))
    return (col, op, v)


def _rand_tree(rng: random.Random, depth: int = 0):
    preds = []
    for _ in range(rng.randint(1, 3)):
        if depth == 0 and rng.random() < 0.3:
            preds.append(
                ("or", [_rand_tree(rng, 1) for _ in range(rng.randint(1, 3))])
            )
        else:
            preds.append(_rand_pred(rng))
    return preds


@pytest.mark.parametrize("partitioned", [False, True])
def test_vector_never_drops_what_dict_keeps(partitioned):
    rng = random.Random(131)
    schema = SCHEMA if not partitioned else SCHEMA
    parts = ["country"] if partitioned else []
    types = {
        f.name: f.dataType for f in schema.fields if f.name not in set(parts)
    } | ({"country": T.StringType()} if partitioned else {})
    for trial in range(150):
        n = rng.randint(1, 30)
        files = [f"files/f{i:04d}.parquet" for i in range(n)]
        stats = {r: _rand_stats(rng, partitioned) for r in files}
        tbl = ckpt_from_dicts(files, stats, schema, parts)
        preds = VersionedLake._normalize_predicates(_rand_tree(rng))
        dict_keep = {
            r
            for r in files
            if VersionedLake._file_may_match(stats[r], preds, types)
        }
        vec_keep = set(vector_keep_rels(tbl, preds, schema, set()))
        assert dict_keep <= vec_keep, (
            trial,
            preds,
            {r: stats[r] for r in dict_keep - vec_keep},
        )


def test_vector_prunes_designed_cases():
    files = [f"files/f{i}.parquet" for i in range(6)]
    stats = {
        files[0]: {"rows": 10, "cols": {"id": {"mn": 0, "mx": 9, "nl": 0}}},
        files[1]: {"rows": 10, "cols": {"id": {"mn": 10, "mx": 19, "nl": 0}}},
        files[2]: {"rows": 0, "cols": {}},  # empty file: always pruned
        files[3]: {"rows": 10, "cols": {"s": {"mn": None, "mx": None, "nl": 10}}},
        files[4]: {
            "rows": 10,
            "cols": {"flag": {"mn": "AA", "mx": "CC", "nl": 0, "vals": ["AA", "CC"]}},
        },
        files[5]: {"rows": 10, "cols": {"id": {"mn": 5, "mx": 5, "nl": 0}}},
    }
    tbl = ckpt_from_dicts(files, stats, SCHEMA, [])

    def keeps(preds):
        return set(
            vector_keep_rels(
                tbl, VersionedLake._normalize_predicates(preds), SCHEMA, set()
            )
        )

    k = keeps([("id", "<", 5)])
    assert files[0] in k and files[1] not in k and files[2] not in k
    # all-null file prunes for null-rejecting ops, keeps for is_null
    assert files[3] not in keeps([("s", "=", "x")])
    assert files[3] in keeps([("s", "is_null", None)])
    assert files[0] not in keeps([("s", "is_null", None)]) or True  # no s stats → keep
    # dictionary membership prunes the 'BB' probe on the AA/CC file
    assert files[4] not in keeps([("flag", "=", "BB")])
    assert files[4] in keeps([("flag", "=", "CC")])
    # dict-set 'in': no literal in the value set → pruned
    assert files[4] not in keeps([("flag", "in", ("BB", "BX"))])
    assert files[4] in keeps([("flag", "in", ("BB", "CC"))])
    # != prunes the provably-constant file
    assert files[5] not in keeps([("id", "!=", 5)])
    assert files[0] in keeps([("id", "!=", 5)])
    # != via a single-value dict set (bounds won't prove it: widen mx)
    files.append("files/f6.parquet")
    stats[files[6]] = {
        "rows": 10,
        "cols": {"flag": {"mn": "AA", "mx": "ZZ", "nl": 0, "vals": ["DD"]}},
    }
    tbl6 = ckpt_from_dicts(files, stats, SCHEMA, [])

    def keeps6(preds):
        return set(
            vector_keep_rels(
                tbl6, VersionedLake._normalize_predicates(preds), SCHEMA, set()
            )
        )

    assert files[6] not in keeps6([("flag", "!=", "DD")])
    assert files[6] in keeps6([("flag", "!=", "EE")])
    # or-union
    k = keeps([("or", [[("id", "<", 3)], [("id", ">", 15)]])])
    assert files[0] in k and files[1] in k and files[5] not in k
    # exclude (removed) wins over everything
    assert files[0] not in set(
        vector_keep_rels(
            tbl,
            VersionedLake._normalize_predicates([("id", "<", 5)]),
            SCHEMA,
            {files[0]},
        )
    )


def test_partition_pruning_vector():
    files = ["files/country=NL/f0.parquet", "files/country=a%3Ab/f1.parquet",
             "files/country=__HIVE_DEFAULT_PARTITION__/f2.parquet"]
    stats = {
        files[0]: {"rows": 5, "cols": {}, "part": {"country": "NL"}},
        files[1]: {"rows": 5, "cols": {}, "part": {"country": "a%3Ab"}},
        files[2]: {
            "rows": 5,
            "cols": {},
            "part": {"country": "__HIVE_DEFAULT_PARTITION__"},
        },
    }
    tbl = ckpt_from_dicts(files, stats, SCHEMA, ["country"])

    def keeps(preds):
        return set(
            vector_keep_rels(
                tbl, VersionedLake._normalize_predicates(preds), SCHEMA, set()
            )
        )

    assert keeps([("country", "=", "NL")]) == {files[0]}
    assert keeps([("country", "=", "a:b")]) == {files[1]}
    assert keeps([("country", "is_null", None)]) == {files[2]}
    assert keeps([("country", "is_not_null", None)]) == {files[0], files[1]}
    assert keeps([("country", "!=", "NL")]) == {files[1]}


def test_roundtrip_and_advance():
    files = [f"files/f{i}.parquet" for i in range(4)]
    stats = {
        r: {"rows": 10, "cols": {"id": {"mn": i * 10, "mx": i * 10 + 9, "nl": 0}}}
        for i, r in enumerate(files)
    }
    tbl = ckpt_from_dicts(files, stats, SCHEMA, [])
    tbl2 = ckpt_from_bytes(ckpt_to_bytes(tbl))
    assert tbl2.equals(tbl)
    adds = ["files/g0.parquet"]
    astats = {"files/g0.parquet": {"rows": 3, "cols": {"id": {"mn": 100, "mx": 109, "nl": 0}}}}
    nxt = ckpt_advance(tbl2, {files[0]}, adds, astats, SCHEMA, [])
    rels = set(nxt.column("rel").to_pylist())
    assert rels == set(files[1:]) | set(adds)
    kept = vector_keep_rels(
        nxt,
        VersionedLake._normalize_predicates([("id", ">=", 100)]),
        SCHEMA,
        set(),
    )
    assert kept == ["files/g0.parquet"]