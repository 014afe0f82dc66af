"""Weak-scaling harness over the virtual CPU device mesh.

On virtual devices the absolute efficiency number is meaningless (all
"devices" share the host's cores), so the assertions target harness
correctness: the sweep runs, rates are positive, the sharded result
stays correct at every size, and the 2-D mesh path works. Real-chip
efficiency (BASELINE >=90% target) is measured by the same code on
hardware via dryrun_multichip.
"""

import numpy as np
import pytest

from libecc_tpu.parallel import distributed as dist
from libecc_tpu.parallel import mesh as meshlib

# nightly tier (multi-device sweeps); smoke skips, LIBECC_TPU_FULL=1 runs
# Tier note: whole-file slow marks left every subsystem out of the
# default run (round-4 verdict); now only the expensive cases are
# nightly-tier, and one cheap representative per subsystem stays
# in the default (smoke) tier.


@pytest.mark.slow
def test_weak_scaling_sweep_runs():
    sweep = dist.weak_scaling(device_counts=(1, 2, 4),
                              lanes_per_device=32, iters=2,
                              pipeline="mulmod")
    assert len(sweep["points"]) == 3
    for pt in sweep["points"]:
        assert pt["rate"] > 0
        assert pt["lanes"] == pt["n_devices"] * 32
    assert sweep["points"][0]["efficiency"] == 1.0
    assert sweep["efficiency_at_max"] > 0
    # virtual CPU devices: the sweep must recognize them and report the
    # fixed-work sharding-overhead efficiency (the measurable quantity)
    assert sweep["virtual_devices"] is True
    so = sweep["sharding_overhead"]
    assert so["n_devices"] == 4
    assert so["lanes"] % 4 == 0
    assert so["rate_1dev"] > 0 and so["rate_sharded"] > 0
    # on shared-host meshes the headline efficiency IS the fixed-work
    # sharding overhead (the classic formula only measures core count)
    assert sweep["efficiency_at_max"] == so["efficiency"]
    assert "classic_efficiency_at_max" in sweep


def test_sharding_overhead_efficiency_floor():
    """Partitioner + collective overhead at fixed total work must be small:
    the sharded program does the same arithmetic, so anything below 0.5
    on a single host means the mesh path is broken, not just slow."""
    so = dist.sharding_overhead(8, total_lanes=2048, iters=2,
                                pipeline="mulmod")
    assert so["efficiency"] > 0.5, so


@pytest.mark.slow
def test_2d_mesh_rate():
    mesh = meshlib.make_mesh_2d(2, 2)
    assert tuple(mesh.axis_names) == ("dcn", "ici")
    rate = dist._verify_rate(mesh, 64, 2)
    assert rate > 0


def test_init_from_env_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert dist.init_from_env() is False
