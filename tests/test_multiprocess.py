"""Real multi-PROCESS jax.distributed coverage (VERDICT r3 item 8).

Spawns 2 localhost processes (CPU platform, 4 virtual devices each),
bootstraps them through libecc_tpu.parallel.distributed.init_from_env
(the production entry), builds the global 8-device mesh, runs the
sharded P-256 ECDSA verify pipeline + sharded_point_sum, and asserts the
globally-gathered accept mask is bit-identical to a single-process run
on the same inputs — the DCN-axis analog the virtual-device tests can't
exercise (every other test is single-process).

Skips cleanly where subprocesses/ports are unavailable.
"""

import os
import json
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
# per-process: 4 virtual CPU devices
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["LIBECC_TPU_REPO"])
from libecc_tpu.parallel import distributed, mesh as M
assert distributed.init_from_env(), "distributed init did not trigger"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from libecc_tpu.curves import params
from libecc_tpu.sig import ecdsa, keys as K
from libecc_tpu.nn import core as nn
from libecc_tpu.curves.shortw import PrjPoint

c = params.get_curve("P-256")
n = 16
rng = np.random.RandomState(7)
privs = [int.from_bytes(rng.bytes(32), "big") % c.q or 1 for _ in range(n)]
msgs = [rng.bytes(32) for _ in range(n)]
nonces = [int.from_bytes(rng.bytes(32), "big") % c.q or 1
          for _ in range(n)]
kb = K.keygen(c, "ECDSA", n, priv_ints=privs)
sigs, ok = ecdsa.sign_batch(kb, msgs, "SHA256", nonces=nonces)
assert np.asarray(ok).all()
# corrupt some lanes so the mask is non-trivial
sigs = list(sigs)
for i in (3, 8, 13):
    b = bytearray(sigs[i]); b[5] ^= 0xFF; sigs[i] = bytes(b)

mesh = M.make_mesh(8)
from libecc_tpu.sig import common as scommon
from libecc_tpu.hash.registry import get_hash
e = scommon.e_from_msgs(get_hash("SHA256"), msgs, c.q_ctx)
nb = 32
r = jnp.asarray(nn.bytes_be_to_limbs_np([s[:nb] for s in sigs], c.q_ctx.k))
s_ = jnp.asarray(nn.bytes_be_to_limbs_np([s[nb:] for s in sigs], c.q_ctx.k))
args = M.shard_batch(mesh, (kb.pub.x, kb.pub.y, kb.pub.z, e, r, s_))
import functools
@functools.partial(jax.jit,
                   out_shardings=NamedSharding(mesh, P()))
def ver(px, py, pz, e, r, s):
    return ecdsa.verify_core(c, PrjPoint(px, py, pz), e, r, s)
acc = np.asarray(jax.device_get(ver(*args)))

# sharded point sum across the global mesh (collective over both hosts)
pts = M.shard_batch(mesh, kb.pub)
red = M.sharded_point_sum(mesh, c, PrjPoint(*pts))
from libecc_tpu.curves.shortw import to_affine_plain
x, y, inf = jax.jit(lambda p: to_affine_plain(c, p))(red)
xs = nn.batch_from_limbs(np.asarray(jax.device_get(x)))
if int(os.environ["JAX_PROCESS_ID"]) == 0:
    print("RESULT " + json.dumps({
        "acc": [bool(v) for v in acc],
        "sum_x": hex(int(xs[0])),
    }), flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_verify(tmp_path):
    port = None
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env_base["LIBECC_TPU_REPO"] = os.path.join(
        os.path.dirname(__file__), "..")
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    try:
        outs = [p.communicate(timeout=900) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed workers timed out (loaded CI host)")
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{se[-3000:]}"
    res = None
    for so, _ in outs:
        for line in so.splitlines():
            if line.startswith("RESULT "):
                res = json.loads(line[len("RESULT "):])
    assert res is not None, "no RESULT line from process 0"
    # single-process ground truth (this process: 8 virtual devices)
    from libecc_tpu.curves import params
    from libecc_tpu.sig import ecdsa, keys as K
    c = params.get_curve("P-256")
    n = 16
    rng = np.random.RandomState(7)
    privs = [int.from_bytes(rng.bytes(32), "big") % c.q or 1
             for _ in range(n)]
    msgs = [rng.bytes(32) for _ in range(n)]
    nonces = [int.from_bytes(rng.bytes(32), "big") % c.q or 1
              for _ in range(n)]
    kb = K.keygen(c, "ECDSA", n, priv_ints=privs)
    sigs, _ = ecdsa.sign_batch(kb, msgs, "SHA256", nonces=nonces)
    sigs = list(sigs)
    for i in (3, 8, 13):
        b = bytearray(sigs[i])
        b[5] ^= 0xFF
        sigs[i] = bytes(b)
    acc = ecdsa.verify_batch(kb, msgs, sigs, "SHA256")
    assert [bool(v) for v in acc] == res["acc"], \
        "multi-process accept mask differs from single-process"
    expect = np.ones(n, bool)
    expect[[3, 8, 13]] = False
    assert res["acc"] == list(expect)
