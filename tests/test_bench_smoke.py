"""Guard the driver-facing entry points: bench.py must print a valid
JSON line on CPU, and __graft_entry__.entry() must trace."""

import json
import io
import sys
import contextlib

import jax


def test_bench_cpu_smoke():
    import bench

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    line = buf.getvalue().strip().splitlines()[-1]
    out = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(out)
    assert out["value"] > 0


def test_graft_entry_traces():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None


def test_bench_sd35_cpu_smoke():
    import bench_sd35

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench_sd35.main()
    rows = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert rows[-1]["bf16"] > 0 and rows[-1]["w8a8_static"] > 0
