"""Mesh/collective tests on the forced 8-device CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zsgnet_tpu.config import Config
from zsgnet_tpu.ops import losses
from zsgnet_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding


def test_make_mesh_all_devices():
    cfg = Config()
    mesh = make_mesh(cfg)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_make_mesh_subset():
    mesh = make_mesh(Config(mesh_shape=(4,)))
    assert mesh.devices.size == 4


def test_mesh_rejects_2d():
    with pytest.raises(ValueError):
        make_mesh(Config(mesh_shape=(2, 4)))


def test_batch_sharding_places_shards():
    cfg = Config()
    mesh = make_mesh(cfg)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    xs = jax.device_put(x, batch_sharding(mesh, cfg))
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_global_loss_normalization_under_shard_map(rng):
    """Per-shard global-normalized partial losses psum to the global loss."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    cfg = Config()
    mesh = make_mesh(cfg)
    B, A = 16, 32
    att = rng.normal(size=(B, A)).astype(np.float32)
    reg = rng.normal(size=(B, A, 4)).astype(np.float32)
    labels = rng.choice([-1, 0, 1], size=(B, A), p=[0.1, 0.8, 0.1]).astype(np.int32)
    labels[:, 0] = 1
    reg_t = rng.normal(size=(B, A, 4)).astype(np.float32)

    global_ls = losses.zsg_loss(
        jnp.asarray(att), jnp.asarray(reg), jnp.asarray(labels), jnp.asarray(reg_t)
    )

    def shard_fn(att, reg, labels, reg_t):
        ls = losses.zsg_loss(att, reg, labels, reg_t, axis_name="data")
        return jax.tree.map(lambda v: jax.lax.psum(v, "data"), ls)

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    out = sharded(
        jnp.asarray(att), jnp.asarray(reg), jnp.asarray(labels), jnp.asarray(reg_t)
    )
    np.testing.assert_allclose(float(out["total"]), float(global_ls["total"]), rtol=1e-5)
    np.testing.assert_allclose(float(out["num_pos"]), float(global_ls["num_pos"]))


@pytest.mark.slow
def test_graft_dryrun_multichip():
    """The driver's multi-chip validation entry must run under this env."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_compiler_options_gating(monkeypatch):
    """cfg.tpu_vmem_kib reaches the compiler only on TPU backends.

    The options dict carries TPU-only flag names that would fail the CPU
    compiler, so off-TPU the helper must return None regardless of cfg;
    on TPU it must emit the scoped-VMEM flag (BASELINE.md round-3 sweeps).
    """
    import jax

    from zsgnet_tpu.config import get_default_cfg
    from zsgnet_tpu.utils.compile import compiler_options_for

    cfg = get_default_cfg()
    assert compiler_options_for(cfg.replace(tpu_vmem_kib=0)) is None
    # Tests run on the forced-CPU platform (conftest): gated out.
    assert compiler_options_for(cfg.replace(tpu_vmem_kib=24576)) is None
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert compiler_options_for(cfg.replace(tpu_vmem_kib=24576)) == {
        "xla_tpu_scoped_vmem_limit_kib": "24576"
    }
