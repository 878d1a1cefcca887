"""Sync orchestration vs the reference's worker topology semantics
(`workers/syncronization.worker/src/Program.fs:50-82`,
`common/hobbes.messaging/src/Broker.fs:74-107,208-256`,
`workers/calculator.worker/src/Program.fs:7-56`)."""

from __future__ import annotations

import os

import pytest

from hobbes_spark.sync import (
    Configuration,
    read_cached,
    sync_configurations,
)

BASE = """provider: localdata
columns: k v
rows:
  - ["a", 1]
  - ["a", 2]
  - ["b", 5]


"""

DOUBLED = BASE + 'create column v2 (v * 2)\n'
OTHER = """provider: localdata
columns: k w
rows:
  - ["a", 10]
  - ["b", 20]


only true
"""


def _dag():
    return [
        Configuration("base", program=DOUBLED),
        Configuration("other", program=OTHER),
        Configuration("both", merge=["base", "other"]),
        Configuration("joined", join=("base", "other", "k"), format_json=True),
    ]


def test_dag_materializes_in_dependency_order(spark, tmp_path):
    cache = str(tmp_path / "cache")
    rep = sync_configurations(spark, _dag(), cache)
    assert rep.converged
    assert set(rep.statuses) == {"base", "other", "both", "joined"}
    assert all(s == "done" for s in rep.statuses.values())
    assert rep.depends_on["joined"] == ("base", "other")

    base = read_cached(spark, cache, rep.cache_keys["base"])
    assert {r["v2"] for r in base.collect()} == {2, 4, 10}
    both = read_cached(spark, cache, rep.cache_keys["both"])
    # Merge row count = sum of inputs (calculator tests Processer.fs:62-72)
    assert both.count() == 3 + 2
    assert set(both.columns) == {"k", "v", "v2", "w"}
    joined = read_cached(spark, cache, rep.cache_keys["joined"])
    assert {(r["k"], r["v"], r["w"]) for r in joined.collect()} == {
        ("a", 1, 10), ("a", 2, 10), ("b", 5, 20)
    }
    # Format message wrote the DataResult JSON export next to the entry
    import json

    with open(os.path.join(cache, rep.cache_keys["joined"]) + ".json") as f:
        dr = json.load(f)
    assert dr["rowCount"] == 3 and "columnNames" in dr


def test_resync_is_all_cache_hits(spark, tmp_path):
    cache = str(tmp_path / "cache")
    first = sync_configurations(spark, _dag(), cache)
    # poison every cache entry's parquet mtime marker via a sentinel
    # file: a re-sync must NOT rewrite anything
    marks = {
        n: os.path.getmtime(os.path.join(cache, k))
        for n, k in first.cache_keys.items()
    }
    second = sync_configurations(spark, _dag(), cache)
    assert second.converged
    assert all(s == "cached" for s in second.statuses.values())
    assert second.cache_keys == first.cache_keys
    for n, k in second.cache_keys.items():
        assert os.path.getmtime(os.path.join(cache, k)) == marks[n]
    # a changed program changes the key (the uniform-cache identity) and
    # recomputes ONLY itself and its dependents
    changed = [
        Configuration("base", program=BASE + 'create column v2 (v * 3)\n'),
        Configuration("other", program=OTHER),
        Configuration("both", merge=["base", "other"]),
    ]
    third = sync_configurations(spark, changed, cache)
    assert third.statuses == {"base": "done", "other": "cached", "both": "done"}
    assert third.cache_keys["base"] != first.cache_keys["base"]


def test_failure_dead_letters_and_blocks_dependents(spark, tmp_path):
    cache = str(tmp_path / "cache")
    bad = BASE + "create column boom (nope_column * 2)\n"
    rep = sync_configurations(
        spark,
        [
            Configuration("bad", program=bad),
            Configuration("okay", program=OTHER),
            Configuration("downstream", merge=["bad", "okay"]),
        ],
        cache,
        max_retries=2,
    )
    assert not rep.converged
    assert rep.statuses == {"bad": "failed", "okay": "done", "downstream": "blocked"}
    assert rep.attempts["bad"] == 2  # the requeue budget (Broker.fs:243-246)
    assert len(rep.failures) == 1  # attempts before the dead-letter
    [dl] = rep.dead_letters
    # DeadLetterMessage shape (Broker.fs:55-62)
    assert dl["OriginalQueue"] == "bad"
    assert "nope_column" in dl["OriginalMessage"]
    assert dl["ExceptionMessage"]
    assert "downstream" not in rep.cache_keys  # blocked nodes never ran


def test_transient_failure_retries_then_succeeds(spark, tmp_path, monkeypatch):
    cache = str(tmp_path / "cache")
    calls = {"n": 0}
    import hobbes_spark.sync as S

    real = S._compute

    def flaky(spark_, cfg, child_keys, cache_dir):
        if cfg.name == "flaky":
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("transient collector hiccup")
        return real(spark_, cfg, child_keys, cache_dir)

    monkeypatch.setattr(S, "_compute", flaky)
    rep = sync_configurations(
        spark, [Configuration("flaky", program=OTHER)], cache, max_retries=5
    )
    assert rep.converged
    assert rep.attempts["flaky"] == 3
    assert len(rep.failures) == 2


def test_independent_nodes_overlap(spark, tmp_path, monkeypatch):
    """Independent DAG nodes run concurrently — the reference fans one
    Sync message per configuration to independent worker queues
    (Program.fs:50-63). A 2-party barrier inside _compute can only be
    satisfied if both nodes are in flight at once."""
    import threading

    import hobbes_spark.sync as S

    cache = str(tmp_path / "cache")
    barrier = threading.Barrier(2, timeout=60)
    real = S._compute

    def rendezvous(spark_, cfg, child_keys, cache_dir):
        barrier.wait()  # deadlocks (-> BrokenBarrierError) if serial
        return real(spark_, cfg, child_keys, cache_dir)

    monkeypatch.setattr(S, "_compute", rendezvous)
    rep = sync_configurations(
        spark,
        [Configuration("left", program=DOUBLED), Configuration("right", program=OTHER)],
        cache,
        max_retries=1,
        max_parallelism=4,
    )
    assert rep.converged and rep.statuses == {"left": "done", "right": "done"}
    (ls, le), (rs, re) = rep.timings["left"], rep.timings["right"]
    assert ls < re and rs < le  # the intervals overlap


def test_cache_key_folds_in_inline_tables(spark, tmp_path):
    """ADVICE r5 (medium): identical program text over DIFFERENT inline
    tables must not collide on one cache entry."""
    cache = str(tmp_path / "cache")
    prog = "provider: localdata\nname: ext\n\n\nonly true\n"
    t1 = spark.createDataFrame([("a", 1)], "k string, v int")
    t2 = spark.createDataFrame([("b", 99)], "k string, v int")
    first = sync_configurations(
        spark, [Configuration("cfg", program=prog, tables={"ext": t1})], cache
    )
    second = sync_configurations(
        spark, [Configuration("cfg", program=prog, tables={"ext": t2})], cache
    )
    assert first.cache_keys["cfg"] != second.cache_keys["cfg"]
    assert second.statuses["cfg"] == "done"  # recomputed, not a stale hit
    assert {r["k"] for r in read_cached(spark, cache, second.cache_keys["cfg"]).collect()} == {"b"}
    # same tables again -> same key, cache hit
    third = sync_configurations(
        spark, [Configuration("cfg", program=prog, tables={"ext": t2})], cache
    )
    assert third.cache_keys["cfg"] == second.cache_keys["cfg"]
    assert third.statuses["cfg"] == "cached"


def test_live_fetcher_refreshes_and_version_pins(spark, tmp_path):
    """A program with a live fetcher and no version refreshes on every
    sync (the Sync message re-triggers collectors); an explicit version
    makes it cacheable until the version changes."""
    cache = str(tmp_path / "cache")
    prog = (
        "provider: rest\nurl:\n    - https://fake/feed\nvalues: value\n\nonly true\n"
    )
    feed = {"body": '{"value": [{"k": "x", "n": 1}]}'}

    def fetch(url):
        return feed["body"]

    live = [Configuration("feed", program=prog, fetcher=fetch)]
    first = sync_configurations(spark, live, cache)
    assert first.statuses["feed"] == "done"
    feed["body"] = '{"value": [{"k": "y", "n": 2}, {"k": "z", "n": 3}]}'
    second = sync_configurations(spark, live, cache)
    assert second.statuses["feed"] == "done"  # NOT 'cached': data refreshed
    got = read_cached(spark, cache, second.cache_keys["feed"])
    assert {r["k"] for r in got.collect()} == {"y", "z"}

    # the refresh CASCADES: a dependent of the live node keeps its own
    # cache key, so a key hit would serve a join over STALE inputs —
    # it must recompute whenever its dependency recomputed this sync
    dims = "provider: localdata\ncolumns: k label\nrows:\n  - [\"y\", \"why\"]\n  - [\"z\", \"zed\"]\n\n\nonly true\n"
    chain = [
        Configuration("feed", program=prog, fetcher=fetch),
        Configuration("dims", program=dims),
        Configuration("joined", join=("feed", "dims", "k")),
    ]
    sync_configurations(spark, chain, cache)
    feed["body"] = '{"value": [{"k": "z", "n": 9}]}'
    again2 = sync_configurations(spark, chain, cache)
    assert again2.statuses == {"feed": "done", "dims": "cached", "joined": "done"}
    joined = read_cached(spark, cache, again2.cache_keys["joined"])
    # outer join (§2.5): unmatched dim row 'y' survives with NULL n;
    # the stale first-sync feed rows (y:2, z:3) must be gone
    assert {(r["k"], r["n"], r["label"]) for r in joined.collect()} == {
        ("z", 9, "zed"), ("y", None, "why")
    }

    pinned = [Configuration("feed2", program=prog, fetcher=fetch, version="v1")]
    sync_configurations(spark, pinned, cache)
    again = sync_configurations(spark, pinned, cache)
    assert again.statuses["feed2"] == "cached"
    bumped = sync_configurations(
        spark,
        [Configuration("feed2", program=prog, fetcher=fetch, version="v2")],
        cache,
    )
    assert bumped.statuses["feed2"] == "done"
    assert bumped.cache_keys["feed2"] != again.cache_keys["feed2"]


def test_force_bypasses_cache_hits(spark, tmp_path):
    cache = str(tmp_path / "cache")
    sync_configurations(spark, _dag(), cache)
    forced = sync_configurations(spark, _dag(), cache, force=True)
    assert forced.converged
    assert all(s == "done" for s in forced.statuses.values())


def test_parallel_equals_serial_on_random_dags(spark, tmp_path, monkeypatch):
    """Property: for random DAGs with planted failures, thread-pooled
    execution produces exactly the serial ledger — statuses, blocked
    propagation, attempts, dead-letter set, cache keys. _compute is
    stubbed (tiny frame or planted raise) so the property run times
    orchestration, not Spark writes."""
    import random

    import hobbes_spark.sync as S

    def stub(spark_, cfg, child_keys, cache_dir):
        if cfg.program is not None and "BOOM" in cfg.program:
            raise RuntimeError("planted failure")
        return spark_.range(1)

    monkeypatch.setattr(S, "_compute", stub)
    rng = random.Random(606)
    for case in range(8):
        names = [f"n{case}_{i}" for i in range(rng.randrange(3, 8))]
        cfgs = []
        for i, name in enumerate(names):
            deps = [d for d in names[:i] if rng.random() < 0.4]
            fail = rng.random() < 0.25
            if deps and rng.random() < 0.5:
                cfgs.append(Configuration(name, merge=deps))
            else:
                body = f"provider: localdata\ncolumns: k\nrows:\n  - [1]\n\n\n{'# BOOM' if fail else '# ok'} {name}\nonly true\n"
                cfgs.append(Configuration(name, program=body))
        serial = sync_configurations(
            spark, cfgs, str(tmp_path / f"s{case}"), max_retries=2, max_parallelism=1
        )
        para = sync_configurations(
            spark, cfgs, str(tmp_path / f"p{case}"), max_retries=2, max_parallelism=8
        )
        assert para.statuses == serial.statuses, f"case {case}"
        assert para.attempts == serial.attempts
        assert para.cache_keys == serial.cache_keys
        assert para.depends_on == serial.depends_on
        # ledgers are sets under concurrency (completion order varies)
        assert sorted(para.failures) == sorted(serial.failures)
        assert sorted(d["OriginalQueue"] for d in para.dead_letters) == sorted(
            d["OriginalQueue"] for d in serial.dead_letters
        )
        assert set(para.timings) == {
            n for n, s in para.statuses.items() if s != "blocked"
        }


def test_validation_errors(spark, tmp_path):
    cache = str(tmp_path / "cache")
    with pytest.raises(ValueError, match="unknown"):
        sync_configurations(
            spark, [Configuration("a", merge=["ghost"])], cache
        )
    with pytest.raises(ValueError, match="cycle"):
        sync_configurations(
            spark,
            [Configuration("a", merge=["b"]), Configuration("b", merge=["a"])],
            cache,
        )
    with pytest.raises(ValueError, match="duplicate"):
        sync_configurations(
            spark,
            [Configuration("a", program=BASE), Configuration("a", program=OTHER)],
            cache,
        )
    with pytest.raises(ValueError, match="exactly one"):
        Configuration("x", program=BASE, merge=["a"])
    with pytest.raises(FileNotFoundError, match="No data for that key"):
        read_cached(spark, cache, "deadbeef")
