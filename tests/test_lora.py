"""LoRA overlay tests: identity init, frozen-base finetune, peft-format
round-trip, UNet adapter coverage (reference surfaces:
`training_utils.py:195`, `llava/model/builder.py:48-90`,
`llava/train/train.py` LoRA args)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from faithdiff_tpu.captioner.llama import LlamaConfig, LlamaForCausalLM
from faithdiff_tpu.training.lora import (count_lora_modules, init_lora,
                                         load_peft_lora, lora_torch_state_dict,
                                         make_lora_train_step, merge_lora)


def _tiny_llama():
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg)
    ids = jnp.zeros((1, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, ids,
                        method=LlamaForCausalLM.init_forward)
    return cfg, model, params


def test_lora_init_is_identity():
    cfg, model, params = _tiny_llama()
    lora = init_lora(params["params"], rank=4, rng=jax.random.PRNGKey(1))
    assert count_lora_modules(lora) > 0
    merged = merge_lora(params["params"], lora)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 6)),
                      jnp.int32)
    pos = jnp.zeros((1, 6), jnp.int32)
    a = model.apply(params, ids, pos, method=LlamaForCausalLM.init_forward)
    b = model.apply({"params": merged}, ids, pos,
                    method=LlamaForCausalLM.init_forward)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lora_finetune_trains_adapter_base_frozen():
    cfg, model, params = _tiny_llama()
    base = params["params"]
    lora = init_lora(base, rank=4, rng=jax.random.PRNGKey(2))

    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 256, (2, 8)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 256, (2, 8)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(8)[None], (2, 8))

    def loss_from_params(p, batch):
        logits = model.apply({"params": p}, batch["ids"], pos,
                             method=LlamaForCausalLM.init_forward)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, batch["labels"][..., None], -1)
        return jnp.mean(nll)

    tx = optax.adam(1e-2)
    step = jax.jit(make_lora_train_step(loss_from_params, params["params"], tx))
    opt_state = tx.init(lora)
    batch = {"ids": ids, "labels": labels}
    losses = []
    for _ in range(5):
        lora, opt_state, metrics = step(lora, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # adapter actually moved; base untouched by construction (closure const)
    bsum = sum(float(jnp.sum(jnp.abs(v["lora_B"])))
               for v in jax.tree.leaves(
                   jax.tree.map(lambda x: x, lora),
                   is_leaf=lambda n: isinstance(n, dict) and "lora_B" in n)
               if isinstance(v, dict))
    assert bsum > 0.0


def test_lora_peft_roundtrip():
    _, _, params = _tiny_llama()
    lora = init_lora(params["params"], rank=2, rng=jax.random.PRNGKey(3),
                     alpha=4.0)
    # make B nonzero so the roundtrip is non-trivial
    lora = jax.tree.map(lambda x: x + 0.1, lora)
    sd = lora_torch_state_dict(lora, prefix="base_model.model.")
    a_keys = [k for k in sd if k.endswith("lora_A.weight")]
    assert a_keys and all(k.startswith("base_model.model.") for k in a_keys)
    assert ".layers.0." in " ".join(a_keys)  # flax layers_0 -> torch layers.0

    back = load_peft_lora(sd, alpha=4.1)
    merged_a = merge_lora(params["params"], lora)
    merged_b = merge_lora(params["params"], back,
                          scale=float(_alpha_scale(lora)))
    for la, lb in zip(jax.tree.leaves(merged_a), jax.tree.leaves(merged_b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)


def _alpha_scale(lora):
    from faithdiff_tpu.training.lora import _scale

    return _scale(lora)


def test_lora_on_tiny_unet():
    from faithdiff_tpu.config import tiny_unet_config
    from faithdiff_tpu.models.unet import UNet2DConditionModel

    cfg = tiny_unet_config()
    model = UNet2DConditionModel(config=cfg)
    b, s = 1, 8
    args = (jnp.zeros((b, s, s, 4)), jnp.zeros((b,)),
            jnp.zeros((b, 77, cfg.cross_attention_dim)), jnp.zeros((b, 64)),
            jnp.zeros((b, 6)),
            jnp.zeros((b, s, s, cfg.condition_channels)))
    params = model.init(jax.random.PRNGKey(0), *args)["params"]
    lora = init_lora(params, rank=4, rng=jax.random.PRNGKey(1))
    # every attention projection in the UNet is adapted
    assert count_lora_modules(lora) >= 40
    # perturbed adapter changes the forward
    lora2 = jax.tree.map(lambda x: x + 0.05, lora)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, s, s, 4)), jnp.float32)
    out_base = model.apply({"params": params}, x, *args[1:])
    out_lora = model.apply({"params": merge_lora(params, lora2)}, x, *args[1:])
    assert float(jnp.abs(out_base - out_lora).max()) > 1e-5
