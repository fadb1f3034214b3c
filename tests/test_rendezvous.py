"""rendezvous_shards: minimal movement (only the dropped shard's
rows move), balanced-ish spread, and per-group calibration buckets
(quality_calibrate) matching a Python replay."""

from __future__ import annotations

import hashlib

from osmgraft.operators.export import rendezvous_shards
from osmgraft.operators.text import quality_calibrate


def _hrw(doc_id, shards):
    return min(
        shards,
        key=lambda s: (
            hashlib.md5(f"{s}:{doc_id}".encode()).hexdigest(),
            s,
        ),
    )


def test_rendezvous_minimal_movement(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(400)], "doc_id long"
    )
    rows = rendezvous_shards(df, n_shards=16, drop_shard=7).collect()
    shards = list(range(16))
    survivors = [s for s in shards if s != 7]
    used = set()
    for r in rows:
        assert r.shard == _hrw(r.doc_id, shards)
        assert r.shard_after == _hrw(r.doc_id, survivors)
        # THE rendezvous property: a row moves iff its shard left
        assert r.moved == (r.shard == 7)
        used.add(r.shard)
    # every shard gets traffic at this size (16 shards, 400 docs)
    assert used == set(shards)


def test_quality_calibrate_replay(spark):
    rows = [
        (i, f"{'x ' * (i % 17)}tail{i}", ["en", "de", "fr"][i % 3])
        for i in range(90)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    got = {
        r.doc_id: (r.lang, r.score, r.decile)
        for r in quality_calibrate(df).collect()
    }
    # python replay
    per_lang = {}
    for i, text, lang in rows:
        score = (len(text) - len(text.replace(" ", ""))) * 1_000_000 + len(
            text
        )
        per_lang.setdefault(lang, []).append((score, i))
    for lang, items in per_lang.items():
        items.sort()
        n = len(items)
        for rn, (score, i) in enumerate(items, 1):
            assert got[i] == (lang, score, (rn - 1) * 10 // n)
    # every decile 0..9 appears (30 docs per lang)
    assert {d for _, _, d in got.values()} == set(range(10))
