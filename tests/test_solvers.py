"""Sampler tests.

The coefficient-table schedulers are verified against a direct *stateful*
numpy implementation of the published UniPC / DPM-Solver++ algorithms
(the oracle mirrors the reference's per-step tensor math,
fm_solvers_unipc.py:351-627 / fm_solvers.py:415-585, in float64), plus
closed-form sanity checks on the sigma schedule.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from moviigen_tpu.diffusion import (
    FlowDPMSolverMultistepScheduler,
    FlowMatchScheduler,
    FlowUniPCMultistepScheduler,
    get_sampling_sigmas,
    shift_sigmas,
)


# ---------------------------------------------------------------- oracles


class _UniPCOracle:
    """Straightforward stateful UniPC (predict_x0, bh2/bh1) in numpy."""

    def __init__(self, sigmas, solver_order=2, solver_type="bh2",
                 lower_order_final=True):
        self.sig = np.asarray(sigmas, dtype=np.float64)  # len n+1
        self.n = len(sigmas) - 1
        self.k = solver_order
        self.solver_type = solver_type
        self.lower_order_final = lower_order_final
        self.outputs = []      # converted outputs, oldest..newest
        self.last_sample = None
        self.this_order = None
        self.lower_order_nums = 0

    def lam(self, i):
        with np.errstate(divide="ignore"):
            return np.log(1 - self.sig[i]) - np.log(self.sig[i])

    def _phi(self, h):
        hh = -h
        h_phi_1 = np.expm1(hh)
        B_h = hh if self.solver_type == "bh1" else np.expm1(hh)
        return hh, h_phi_1, B_h

    def _system(self, rks, hh, h_phi_1, B_h, order):
        R, b = [], []
        h_phi_k = h_phi_1 / hh - 1
        fact = 1
        for j in range(1, order + 1):
            R.append(np.power(rks, j - 1))
            b.append(h_phi_k * fact / B_h)
            fact *= j + 1
            h_phi_k = h_phi_k / hh - 1 / fact
        return np.stack(R), np.asarray(b)

    def _predict(self, i, x, order):
        sigma_t, sigma_s0 = self.sig[i + 1], self.sig[i]
        alpha_t = 1 - sigma_t
        h = self.lam(i + 1) - self.lam(i)
        hh, h_phi_1, B_h = self._phi(h)
        m0 = self.outputs[-1]
        rks, D1s = [], []
        for j in range(1, order):
            lam_sj = self.lam(i - j)
            rk = (lam_sj - self.lam(i)) / h
            rks.append(rk)
            D1s.append((self.outputs[-(j + 1)] - m0) / rk)
        rks.append(1.0)
        rks = np.asarray(rks)
        x_t = sigma_t / sigma_s0 * x - alpha_t * h_phi_1 * m0 \
            if sigma_s0 > 0 else -alpha_t * h_phi_1 * m0
        if D1s:
            if order == 2:
                rhos_p = np.array([0.5])
            else:
                R, b = self._system(rks, hh, h_phi_1, B_h, order)
                rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])
            pred_res = sum(r * d for r, d in zip(rhos_p, D1s))
            x_t = x_t - alpha_t * B_h * pred_res
        return x_t

    def _correct(self, i, x_t, m_t, order):
        x = self.last_sample
        sigma_t, sigma_s0 = self.sig[i], self.sig[i - 1]
        alpha_t = 1 - sigma_t
        h = self.lam(i) - self.lam(i - 1)
        hh, h_phi_1, B_h = self._phi(h)
        m0 = self.outputs[-1]
        rks, D1s = [], []
        for j in range(1, order):
            lam_sj = self.lam(i - 1 - j)
            rk = (lam_sj - self.lam(i - 1)) / h
            rks.append(rk)
            D1s.append((self.outputs[-(j + 1)] - m0) / rk)
        rks.append(1.0)
        rks = np.asarray(rks)
        if order == 1:
            rhos_c = np.array([0.5])
        else:
            R, b = self._system(rks, hh, h_phi_1, B_h, order)
            rhos_c = np.linalg.solve(R, b)
        corr_res = sum(r * d for r, d in zip(rhos_c[:-1], D1s)) if D1s else 0.0
        D1_t = m_t - m0
        return (sigma_t / sigma_s0 * x - alpha_t * h_phi_1 * m0
                - alpha_t * B_h * (corr_res + rhos_c[-1] * D1_t))

    def step(self, i, model_output, sample):
        m_t = sample - self.sig[i] * model_output  # x0 convert
        use_corr = i > 0 and self.last_sample is not None
        if use_corr:
            sample = self._correct(i, sample, m_t, self.this_order)
        self.outputs.append(m_t)
        order = min(self.k, self.n - i) if self.lower_order_final else self.k
        order = min(order, self.lower_order_nums + 1)
        self.this_order = order
        self.last_sample = sample
        x_next = self._predict(i, sample, order)
        if self.lower_order_nums < self.k:
            self.lower_order_nums += 1
        return x_next


def _fake_model(x, t_value, shape_seed=0):
    """Deterministic pseudo-model: v = tanh(x)·c1 + sin(t/1000)·c2."""
    rng = np.random.default_rng(shape_seed)
    c1 = rng.standard_normal(x.shape) * 0.3
    c2 = rng.standard_normal(x.shape) * 0.1
    return np.tanh(x) * c1 + np.sin(t_value / 1000.0) * c2


# ---------------------------------------------------------------- schedule


def test_sigma_schedule_values():
    s = FlowUniPCMultistepScheduler(num_train_timesteps=1000, shift=1.0)
    assert s.sigma_max == pytest.approx(1 - 1 / 1000)
    assert s.sigma_min == pytest.approx(0.0)
    s.set_timesteps(10, shift=5.0)
    # first sigma: shift applied to 0.999
    want0 = 5 * 0.999 / (1 + 4 * 0.999)
    assert s.sigmas[0] == pytest.approx(want0, rel=1e-6)
    assert s.sigmas[-1] == 0.0
    assert len(s.sigmas) == 11
    assert len(s.timesteps) == 10
    assert s.timesteps.dtype == np.int64
    assert s.timesteps[0] == int(want0 * 1000)


def test_get_sampling_sigmas():
    sig = get_sampling_sigmas(10, 5.0)
    assert sig[0] == pytest.approx(1.0)
    assert len(sig) == 10
    base = np.linspace(1, 0, 11)[:10]
    np.testing.assert_allclose(sig, shift_sigmas(base, 5.0))


# ---------------------------------------------------------------- UniPC


@pytest.mark.parametrize("steps", [3, 10, 27])
@pytest.mark.parametrize("solver_type", ["bh2", "bh1"])
def test_unipc_matches_stateful_oracle(steps, solver_type):
    sched = FlowUniPCMultistepScheduler(
        num_train_timesteps=1000, shift=1.0, solver_type=solver_type)
    sched.set_timesteps(steps, shift=5.0)

    oracle = _UniPCOracle(sched.sigmas, solver_type=solver_type)

    rng = np.random.default_rng(42)
    x = rng.standard_normal((1, 4, 3, 5)).astype(np.float64)
    x_o = x.copy()
    state = sched.init_state(jnp.asarray(x, jnp.float32))
    xs = jnp.asarray(x, jnp.float32)

    for i, t in enumerate(sched.timesteps):
        v = _fake_model(np.asarray(xs, np.float64), float(t))
        xs, state = sched.step(jnp.asarray(v, jnp.float32), i, xs, state)

        v_o = _fake_model(x_o, float(t))
        x_o = oracle.step(i, v_o, x_o)

    np.testing.assert_allclose(np.asarray(xs), x_o, atol=5e-4, rtol=1e-3)


def test_unipc_final_step_returns_x0_pred():
    """At the last step σ→0, the predictor must reduce to the x0 estimate."""
    sched = FlowUniPCMultistepScheduler()
    sched.set_timesteps(1, shift=5.0)
    x = jnp.ones((2, 2), jnp.float32) * 3.0
    v = jnp.ones((2, 2), jnp.float32)
    state = sched.init_state(x)
    out, _ = sched.step(v, 0, x, state)
    want = np.asarray(x) - sched.sigmas[0] * np.asarray(v)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)


# ---------------------------------------------------------------- DPM++


class _DPMOracle:
    """Stateful DPM-Solver++ (midpoint, deterministic) in numpy."""

    def __init__(self, sigmas, solver_order=2, n_steps=None):
        self.sig = np.asarray(sigmas, np.float64)
        self.n = len(sigmas) - 1
        self.k = solver_order
        self.outputs = []
        self.lower_order_nums = 0

    def lam(self, i):
        with np.errstate(divide="ignore"):
            return np.log(1 - self.sig[i]) - np.log(self.sig[i])

    def step(self, i, model_output, sample):
        m = sample - self.sig[i] * model_output
        self.outputs.append(m)
        last = i == self.n - 1
        lower_final = last  # final_sigmas_type == "zero"
        lower_second = (i == self.n - 2) and self.n < 15
        sigma_t, sigma_s0 = self.sig[i + 1], self.sig[i]
        alpha_t = 1 - sigma_t
        h = self.lam(i + 1) - self.lam(i)
        e = np.exp(-h) - 1
        A = sigma_t / sigma_s0 if sigma_s0 > 0 else 0.0
        if self.k == 1 or self.lower_order_nums < 1 or lower_final:
            x_t = A * sample - alpha_t * e * m
        else:
            m1 = self.outputs[-2]
            h0 = self.lam(i) - self.lam(i - 1)
            r0 = h0 / h
            with np.errstate(divide="ignore", invalid="ignore"):
                D1 = (m - m1) / r0
            D1 = np.nan_to_num(D1, nan=0.0, posinf=0.0, neginf=0.0)
            x_t = A * sample - alpha_t * e * m - 0.5 * alpha_t * e * D1
        if self.lower_order_nums < self.k:
            self.lower_order_nums += 1
        return x_t


@pytest.mark.parametrize("steps", [4, 10, 25])
def test_dpmpp_matches_stateful_oracle(steps):
    sched = FlowDPMSolverMultistepScheduler(num_train_timesteps=1000, shift=1.0)
    sched.set_timesteps(steps, sigmas=get_sampling_sigmas(steps, 5.0))

    oracle = _DPMOracle(sched.sigmas)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 4)).astype(np.float64)
    x_o = x.copy()
    state = sched.init_state(jnp.asarray(x, jnp.float32))
    xs = jnp.asarray(x, jnp.float32)

    for i, t in enumerate(sched.timesteps):
        v = _fake_model(np.asarray(xs, np.float64), float(t), shape_seed=1)
        xs, state = sched.step(jnp.asarray(v, jnp.float32), i, xs, state)
        v_o = _fake_model(x_o, float(t), shape_seed=1)
        x_o = oracle.step(i, v_o, x_o)

    np.testing.assert_allclose(np.asarray(xs), x_o, atol=5e-4, rtol=1e-3)


# ----------------------------------------------------- solver convergence


def test_solvers_integrate_linear_flow_exactly():
    """For a constant velocity field v = noise − x0 (straight-line flow),
    any flow-match sampler must land exactly on x0 at σ=0."""
    x0 = np.array([1.0, -2.0, 0.5])
    noise = np.array([0.3, 0.7, -1.1])

    for sched in (FlowUniPCMultistepScheduler(),
                  FlowDPMSolverMultistepScheduler()):
        sched.set_timesteps(10, shift=3.0)
        x = jnp.asarray(noise * sched.sigmas[0] + x0 * (1 - sched.sigmas[0]),
                        jnp.float32)
        state = sched.init_state(x)
        v = jnp.asarray(noise - x0, jnp.float32)
        for i in range(10):
            x, state = sched.step(v, i, x, state)
        np.testing.assert_allclose(np.asarray(x), x0, atol=1e-4)


# ---------------------------------------------------------------- Euler


def test_flow_match_scheduler_roundtrip():
    s = FlowMatchScheduler(num_inference_steps=20, shift=3.0)
    x0 = jnp.asarray(np.random.default_rng(3).standard_normal((4,)),
                     jnp.float32)
    noise = jnp.asarray(np.random.default_rng(4).standard_normal((4,)),
                        jnp.float32)
    t = s.timesteps[5]
    noisy = s.add_noise(x0, noise, t)
    sigma = s.sigmas[5]
    np.testing.assert_allclose(
        np.asarray(noisy), (1 - sigma) * np.asarray(x0) + sigma * np.asarray(noise),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s.training_target(x0, noise, t)),
        np.asarray(noise) - np.asarray(x0), rtol=1e-6)

    # Euler steps with the exact straight-line velocity reach x0
    x = s.add_noise(x0, noise, s.timesteps[0])
    v = noise - x0
    for t in s.timesteps:  # final step maps σ_min → 0 (to_final semantics)
        x = s.step(v, t, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-5)


@pytest.mark.parametrize("solver_cls", [FlowUniPCMultistepScheduler,
                                        FlowDPMSolverMultistepScheduler])
def test_scan_sample_matches_python_loop(solver_cls):
    """The fully-scanned denoise loop must equal per-step stepping."""
    import jax.numpy as jnp

    sched = solver_cls(num_train_timesteps=1000, shift=1.0)
    sched.set_timesteps(8, shift=5.0)

    rng = np.random.default_rng(11)
    c1 = jnp.asarray(rng.standard_normal((2, 3, 4)) * 0.3, jnp.float32)

    def model_fn(x, t):
        return jnp.tanh(x) * c1 + jnp.sin(t[0] / 1000.0)

    x0 = jnp.asarray(rng.standard_normal((2, 3, 4)), jnp.float32)

    # python loop
    x = x0
    state = sched.init_state(x)
    for i, t in enumerate(sched.timesteps):
        v = model_fn(x, jnp.asarray([float(t)], jnp.float32))
        x, state = sched.step(v, i, x, state)

    # scan
    x_scan = sched.scan_sample(model_fn, x0)
    np.testing.assert_allclose(np.asarray(x_scan), np.asarray(x),
                               atol=1e-5, rtol=1e-5)
