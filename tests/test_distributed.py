"""Real multi-process DCN-path test (VERDICT round-2 item 8).

Two OS processes coordinate through ``jax.distributed.initialize`` (a
local coordinator standing in for the TPU pod metadata service), each
owning 2 virtual CPU devices; the 2x2 ("dcn", "ici") mesh from
``make_host_mesh`` shards the batch across processes exactly as a
2-host pod slice would, with per-process shards fed through
``jax.make_array_from_process_local_data``.  Process 0 checks the
globally-reduced metrics and its local shard against a single-process
solve of the same batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, sys
import numpy as np
import jax

proc_id = int(sys.argv[1]); coord = sys.argv[2]
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)

import jax.numpy as jnp
import lexls_tpu.lexlsi as jli
from lexls_tpu import types as T
from lexls_tpu.oracle import generate as gen
from lexls_tpu.parallel import (batched_initial_arrays, make_host_mesh,
                                make_sharded_solver_2d, solve_batched)
from jax.sharding import NamedSharding, PartitionSpec as P

rng = np.random.default_rng(0)
B = 8
base = gen.random_inequality_hierarchy(rng, 6, [4, 3])
As = np.stack([base.A + 1e-2 * rng.standard_normal(base.A.shape)
               for _ in range(B)])
lbs = np.broadcast_to(base.lb, (B,) + base.lb.shape).copy()
ubs = np.broadcast_to(base.ub, (B,) + base.ub.shape).copy()
struct = jli.Structure.of(base)
params = T.ParametersLexLSI()
c0, s0, n0, x0, v0 = batched_initial_arrays(base, B)
reg = jnp.asarray(base.regularization)

mesh = make_host_mesh(2, 2)
spec = P(("dcn", "ici"))
sh = NamedSharding(mesh, spec)
rep = NamedSharding(mesh, P())

def dist(arr):
    arr = np.asarray(arr)
    local = arr[proc_id * (B // 2):(proc_id + 1) * (B // 2)]
    return jax.make_array_from_process_local_data(sh, local, arr.shape)

args = tuple(dist(a) for a in
             (As, lbs, ubs, c0, s0, n0, x0, v0)) + (
    jax.device_put(np.asarray(reg), rep),)
fn = make_sharded_solver_2d(mesh, struct, params)
st, metrics = fn(*args)

# single-process reference on the local half of the batch
ref = solve_batched(jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
                    c0, s0, n0, x0, v0, reg, struct=struct, params=params)
lo, hi = proc_id * (B // 2), (proc_id + 1) * (B // 2)
x_local = np.concatenate([np.asarray(s.data) for s in
                          sorted(st.x.addressable_shards,
                                 key=lambda s: s.index[0].start or 0)])
ok_x = bool(np.allclose(x_local, np.asarray(ref.x)[lo:hi], atol=1e-10))
out = {"proc": proc_id,
       "solved": int(metrics["solved"]),
       "expect_solved": int(np.sum(np.asarray(ref.status) == 0)),
       "max_it": int(metrics["max_iterations"]),
       "expect_max_it": int(np.max(np.asarray(ref.it))),
       "x_ok": ok_x}
print("RESULT " + json.dumps(out), flush=True)
jax.distributed.shutdown()
"""


@pytest.mark.skipif(os.environ.get("LEXLS_SKIP_DISTRIBUTED") == "1",
                    reason="distributed test disabled by env")
def test_two_process_dcn_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), coord],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out")
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["proc"]] = r
    assert set(results) == {0, 1}, f"missing worker results: {outs}"
    for r in results.values():
        assert r["solved"] == r["expect_solved"], (r, outs)
        assert r["max_it"] == r["expect_max_it"], r
        assert r["x_ok"], r
