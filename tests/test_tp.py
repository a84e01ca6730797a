"""Tensor-parallel sharding tests on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from faithdiff_tpu.config import tiny_unet_config
from faithdiff_tpu.models.unet import UNet2DConditionModel
from faithdiff_tpu.parallel.tp import apply_tp, unet_tp_shardings


def _mesh_2d():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("data", "model"))


def test_tp_shardings_target_attention_projections():
    cfg = tiny_unet_config()
    model = UNet2DConditionModel(config=cfg)
    b, hw = 2, 16
    args = (jnp.zeros((b, hw, hw, 4)), jnp.zeros((b,)),
            jnp.zeros((b, 77, cfg.cross_attention_dim)), jnp.zeros((b, 64)),
            jnp.zeros((b, 6)), jnp.zeros((b, hw, hw, cfg.condition_channels)))
    params = model.init(jax.random.PRNGKey(0), *args)
    mesh = _mesh_2d()
    shardings = unet_tp_shardings(params, mesh)

    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    col = [s for p, s in flat
           if "to_q" in str(p) and str(p).endswith("'kernel'),)")]
    specs = {str(p): s.spec for p, s in flat}
    to_q = [v for k, v in specs.items() if "to_q" in k and "kernel" in k]
    assert to_q and all(v == P(None, "model") for v in to_q)
    to_out = [v for k, v in specs.items()
              if "attn1" in k and "to_out" in k and "kernel" in k]
    assert to_out and all(v == P("model", None) for v in to_out)
    convs = [v for k, v in specs.items() if "conv_in" in k and "kernel" in k]
    assert all(v == P() for v in convs)


def test_tp_forward_matches_replicated():
    """UNet forward with TP-sharded params must equal the replicated run."""
    cfg = tiny_unet_config()
    model = UNet2DConditionModel(config=cfg)
    rng = np.random.default_rng(0)
    b, hw = 2, 16
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa
    args = (mk(b, hw, hw, 4), jnp.full((b,), 500.0),
            mk(b, 77, cfg.cross_attention_dim), mk(b, 64),
            jnp.zeros((b, 6)), mk(b, hw, hw, cfg.condition_channels))
    params = model.init(jax.random.PRNGKey(0), *args)
    ref = model.apply(params, *args)

    mesh = _mesh_2d()
    tp_params = apply_tp(params, mesh)
    # verify at least one leaf is actually sharded over 'model'
    leaves = jax.tree.leaves(tp_params)
    assert any(len(l.sharding.device_set) == 8 for l in leaves)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
            else mesh:
        out = jax.jit(model.apply)(tp_params, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
