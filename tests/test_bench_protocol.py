"""Bench protocol contract (r5 verdict item 7): bench.py must keep the
interleaved-median flagship protocol (warmup + 3 timed reps with min/max
dispersion) and best-of-2-after-warmup suite timing.  Everything Spark is
stubbed — this asserts the PROTOCOL, in milliseconds, so a future edit
cannot silently drop the warmup or the repetitions."""

import json


class _FakeDF:
    def __init__(self, name, calls):
        self._name = name
        self._calls = calls

    def count(self):
        self._calls[self._name] = self._calls.get(self._name, 0) + 1
        return 1


class _QDict(dict):
    def __init__(self, calls):
        super().__init__()
        self._calls = calls

    def __getitem__(self, name):
        return lambda spark, sf_dir, n=name: _FakeDF(n, self._calls)


def test_bench_emits_protocol_fields_and_reps(monkeypatch, capsys):
    import bench
    import __spark_entry__ as em
    from s2geography_spark import session as sess

    calls = {}
    flagship_runs = {"n": 0}

    def fake_flagship(spark, n_pages):
        flagship_runs["n"] += 1
        return 100, 50, 0.25

    join_runs = {"n": 0}

    def fake_join(spark, path):
        join_runs["n"] += 1
        return 100, 50, 0.125

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(em, "queries", lambda: _QDict(calls))
    monkeypatch.setattr(bench, "run_flagship", fake_flagship)
    monkeypatch.setattr(bench, "materialize_mentions",
                        lambda spark, n, p: p)
    monkeypatch.setattr(bench, "run_join_bench", fake_join)
    monkeypatch.setattr(sess, "get_spark", lambda *a, **k: object())

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(out)

    # ONE JSON line with the driver-contract keys
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in d, key
    assert d["unit"] == "sec"
    # flagship: 1 warmup + 3 timed interleaved reps, median + dispersion
    assert flagship_runs["n"] == 4
    assert join_runs["n"] == 4
    sj = d["spatial_join"]
    assert "end_to_end_min_max" in sj and "join_only_min_max" in sj
    assert d["warmup_runs"] == 1
    # every suite query: 1 warmup + 2 timed runs (best-of-2)
    assert len(calls) >= 30
    for name, n in calls.items():
        assert n == 3, f"{name} ran {n}x, protocol is warmup + 2 timed"
        assert name in d["queries"]
