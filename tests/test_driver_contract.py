"""Driver-contract smoke tests: bench.py emits one valid JSON line; the
__graft_entry__ hooks compile and run on the test mesh."""

import io
import json
import os
import sys
from contextlib import redirect_stdout

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_bench_emits_valid_json_line():
    import bench

    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main(d=3, m_d=4, iters=4)  # tiny CPU-friendly shape
    lines = [l for l in buf.getvalue().strip().splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec
    assert rec["metric"] == "kron_matvec_bandwidth"
    assert np.isfinite(rec["value"]) and rec["value"] > 0


def test_graft_entry_contract():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
    ge.dryrun_multichip(2)  # 1-D data mesh on the 8 virtual devices
