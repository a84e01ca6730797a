"""Scheduler math tests."""
import jax
import jax.numpy as jnp
import numpy as np

from faithdiff_tpu.config import SchedulerConfig
from faithdiff_tpu.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    EulerDiscreteScheduler,
    spaced_timesteps,
)


def test_spaced_timesteps_leading():
    cfg = SchedulerConfig()
    ts = spaced_timesteps(cfg, 20)
    # leading spacing with steps_offset=1: 50*k + 1, descending from 951
    assert ts[0] == 951 and ts[-1] == 1
    assert len(ts) == 20
    assert all(np.diff(ts) < 0)


def test_euler_init_noise_sigma():
    sched = EulerDiscreteScheduler(SchedulerConfig())
    state = sched.set_timesteps(20)
    # leading spacing -> init_noise_sigma = sqrt(max_sigma^2 + 1)
    max_sigma = float(jnp.max(state.sigmas))
    np.testing.assert_allclose(
        float(state.init_noise_sigma), (max_sigma ** 2 + 1) ** 0.5, rtol=1e-6
    )
    assert float(state.sigmas[-1]) == 0.0


def test_euler_exact_epsilon_recovers_x0():
    """With a model that predicts epsilon exactly, the Euler trajectory from
    x = x0 + sigma_max * eps integrates to exactly x0."""
    sched = EulerDiscreteScheduler(SchedulerConfig())
    state = sched.set_timesteps(20)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    x = x0 + eps * state.sigmas[0]
    for i in range(20):
        scaled = sched.scale_model_input(state, x, i)
        # verify scale matches 1/sqrt(sigma^2+1)
        sig = float(state.sigmas[i])
        np.testing.assert_allclose(
            np.asarray(scaled), np.asarray(x) / (sig ** 2 + 1) ** 0.5, rtol=1e-5
        )
        x = sched.step(state, eps, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_ddim_exact_epsilon_recovers_x0():
    sched = DDIMScheduler(SchedulerConfig())
    state = sched.set_timesteps(20)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    ddpm = DDPMScheduler(SchedulerConfig())
    t0 = state.timesteps[0]
    x = ddpm.add_noise(x0, eps, jnp.array([t0]))
    for i in range(20):
        x = sched.step(state, eps, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_ddpm_add_noise_t999_mostly_noise():
    sched = DDPMScheduler(SchedulerConfig())
    x0 = jnp.ones((1, 4, 4, 4))
    noise = jnp.zeros((1, 4, 4, 4))
    out = sched.add_noise(x0, noise, jnp.array([999]))
    # at t=999 nearly everything is noise: sqrt(alpha_bar_999) is tiny
    assert float(jnp.abs(out).max()) < 0.15
    out0 = sched.add_noise(x0, noise, jnp.array([0]))
    np.testing.assert_allclose(float(out0.mean()), 1.0, atol=2e-3)


def test_ddpm_step_posterior_mean_formula():
    """One DDPM step must equal the closed-form posterior mean
    mu = c0 * pred_x0 + c1 * x_t (Ho et al. eq. 7)."""
    cfg = SchedulerConfig()
    sched = DDPMScheduler(cfg)
    state = sched.set_timesteps(50)
    i = 10
    t = int(state.timesteps[i])
    prev_t = t - cfg.num_train_timesteps // 50
    ac = np.asarray(sched.alphas_cumprod)
    ac_t, ac_prev = ac[t], ac[prev_t] if prev_t >= 0 else 1.0

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    out = np.asarray(sched.step(state, jnp.asarray(eps), i, jnp.asarray(x)))

    pred_x0 = (x - np.sqrt(1 - ac_t) * eps) / np.sqrt(ac_t)
    cur_alpha = ac_t / ac_prev
    c0 = np.sqrt(ac_prev) * (1 - cur_alpha) / (1 - ac_t)
    c1 = np.sqrt(cur_alpha) * (1 - ac_prev) / (1 - ac_t)
    ref = c0 * pred_x0 + c1 * x
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_ddpm_final_step_returns_pred_x0():
    """At the last timestep (prev_t < 0) the step must return pred_x0."""
    sched = DDPMScheduler(SchedulerConfig())
    state = sched.set_timesteps(50)
    i = 49
    t = int(state.timesteps[i])
    assert t - 1000 // 50 < 0
    ac_t = float(sched.alphas_cumprod[t])
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 2, 2, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 2, 2, 4)).astype(np.float32)
    out = np.asarray(sched.step(state, jnp.asarray(eps), i, jnp.asarray(x)))
    pred_x0 = (x - np.sqrt(1 - ac_t) * eps) / np.sqrt(ac_t)
    np.testing.assert_allclose(out, pred_x0, atol=1e-5)


def test_scheduler_state_is_vmappable():
    """Per-tile scheduler stepping: vmap over a batch of tiles must equal the
    sequential per-tile loop (the reference's deep-copied per-tile
    scheduler state, made pure)."""
    sched = EulerDiscreteScheduler(SchedulerConfig())
    state = sched.set_timesteps(10)
    rng = np.random.default_rng(3)
    tiles = jnp.asarray(rng.standard_normal((4, 8, 8, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((4, 8, 8, 4)), jnp.float32)

    batched = sched.step(state, eps, 0, tiles)  # broadcasts over batch
    seq = jnp.stack(
        [sched.step(state, eps[i], 0, tiles[i]) for i in range(4)]
    )
    np.testing.assert_allclose(np.asarray(batched), np.asarray(seq), rtol=1e-6)


def test_euler_ancestral_step():
    from faithdiff_tpu.schedulers import EulerAncestralDiscreteScheduler

    sched = EulerAncestralDiscreteScheduler(SchedulerConfig())
    state = sched.set_timesteps(10)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    # deterministic part (no key): must differ from plain Euler (sigma_down)
    det = sched.step(state, eps, 0, x)
    plain = EulerDiscreteScheduler(SchedulerConfig()).step(state, eps, 0, x)
    assert np.abs(np.asarray(det) - np.asarray(plain)).max() > 1e-6
    # stochastic part: different keys -> different results, same key -> same
    a = sched.step(state, eps, 0, x, key=jax.random.PRNGKey(0))
    b = sched.step(state, eps, 0, x, key=jax.random.PRNGKey(0))
    c = sched.step(state, eps, 0, x, key=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6
    # final step: sigma_to = 0 -> no noise regardless of key
    last = sched.step(state, eps, 9, x, key=jax.random.PRNGKey(2))
    last2 = sched.step(state, eps, 9, x, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(last), np.asarray(last2), atol=1e-6)


def test_euler_karras_sigmas():
    cfg = SchedulerConfig(use_karras_sigmas=True)
    sched = EulerDiscreteScheduler(cfg)
    state = sched.set_timesteps(10)
    sig = np.asarray(state.sigmas)
    assert sig[-1] == 0.0
    assert all(np.diff(sig[:-1]) < 0)  # strictly decreasing
    # Karras rho-7 spacing concentrates steps at low sigmas: the median
    # sigma is well below the linear-interp schedule's median
    lin = np.asarray(
        EulerDiscreteScheduler(SchedulerConfig()).set_timesteps(10).sigmas)
    assert np.median(sig[:-1]) < np.median(lin[:-1])
    # rho-7 tail: consecutive low-sigma ratios are near-geometric
    ratios = sig[1:-1] / sig[:-2]
    assert ratios.std() < 0.1
    # exact-epsilon recovery still holds under Karras spacing
    rng = np.random.default_rng(6)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    x = x0 + eps * state.sigmas[0]
    for i in range(10):
        x = sched.step(state, eps, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_ddpm_stochastic_step_noise_gating():
    sched = DDPMScheduler(SchedulerConfig())
    state = sched.set_timesteps(50)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    a = sched.step(state, eps, 0, x, key=jax.random.PRNGKey(0))
    b = sched.step(state, eps, 0, x, key=jax.random.PRNGKey(1))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6
    # t=0 injects no noise (t > 0 gate)
    # find the index where timestep == smallest
    i_last = 49
    la = sched.step(state, eps, i_last, x, key=jax.random.PRNGKey(0))
    lb = sched.step(state, eps, i_last, x, key=jax.random.PRNGKey(1))
    t_last = int(state.timesteps[i_last])
    if t_last == 0:
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
