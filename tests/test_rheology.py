"""Rheology unit tests against hand-derived values from the reference
formulas (model/finiteelement.cpp:4137-4260 BBM; 10649-10726 (m)EVP)."""

import math

import jax.numpy as jnp
import numpy as np

from nextsim_tpu.core import constants as phys
from nextsim_tpu.ops.rheology import (
    BBMParams,
    EVPParams,
    bbm_update,
    evp_update,
    mevp_update,
)


def _cellful(v, shape=(2, 2)):
    return jnp.full(shape, v, jnp.float32)


def test_bbm_elastic_buildup_matches_hand_calc():
    """Undamaged, full concentration, tensile strain: stress increment
    dt*E*Dunit@eps scaled by lambda/(lambda+dt) (tildeP=0 for sigma_n>0)."""
    p = BBMParams()
    dt = 2.0
    eps11 = _cellful(1e-6)
    eps22 = _cellful(0.0)
    eps12 = _cellful(0.0)
    sigma = jnp.zeros((3, 2, 2))
    damage = _cellful(0.0)
    conc = _cellful(1.0)
    thick = _cellful(1.0)
    cohesion = _cellful(1e9)  # huge: no failure
    trelax = _cellful(1e12)  # no healing
    sig, dmg = bbm_update(
        sigma, damage, conc, thick, cohesion, trelax, eps11, eps22, eps12,
        10e3, dt, p,
    )
    # hand calc: expC=1, time_viscous=lambda0=1e7, multiplicator=1e7/(1e7+dt)
    d0 = 1.0 / (1.0 - p.nu0**2)
    d1 = d0 * p.nu0
    mult = 1e7 / (1e7 + dt)
    expected_sxx = dt * p.young * d0 * 1e-6 * mult
    expected_syy = dt * p.young * d1 * 1e-6 * mult
    np.testing.assert_allclose(float(sig[0, 0, 0]), expected_sxx, rtol=1e-5)
    np.testing.assert_allclose(float(sig[1, 0, 0]), expected_syy, rtol=1e-5)
    assert float(sig[2, 0, 0]) == 0.0
    np.testing.assert_allclose(np.asarray(dmg), 0.0, atol=1e-7)


def test_bbm_no_ice_resets():
    p = BBMParams()
    sigma = jnp.ones((3, 2, 2)) * 1e3
    sig, dmg = bbm_update(
        sigma, _cellful(0.5), _cellful(0.05), _cellful(0.1), _cellful(1e3),
        _cellful(1e12), _cellful(0.0), _cellful(0.0), _cellful(0.0), 10e3, 2.0,
        p,
    )
    np.testing.assert_allclose(np.asarray(sig), 0.0)
    np.testing.assert_allclose(np.asarray(dmg), 0.0)


def test_bbm_damage_growth_on_shear_failure():
    """Large shear stress beyond Mohr-Coulomb -> damage grows, stress relaxes."""
    p = BBMParams()
    dt = 2.0
    # seed a large shear stress state, no strain input
    sigma = jnp.stack([_cellful(0.0), _cellful(0.0), _cellful(5e4)])
    cohesion = _cellful(10e3)  # small cohesion -> dcrit = C/sigma_s < 1
    sig, dmg = bbm_update(
        sigma, _cellful(0.0), _cellful(1.0), _cellful(1.0), cohesion,
        _cellful(1e12), _cellful(0.0), _cellful(0.0), _cellful(0.0), 10e3, dt,
        p,
    )
    d = float(dmg[0, 0])
    assert d > 0.0
    # hand: sigma_s = 5e4*mult, mult = 1e7/(1e7+2) ~ 1; dcrit = 1e4/5e4 = 0.2
    # rtd = sqrt(E)/(dx*sqrt(2*(1+nu)*rhoi)); del_d = (1-dcrit)*dt*rtd
    mult = 1e7 / (1e7 + dt)
    sigma_s = 5e4 * mult
    dcrit = 1e4 / sigma_s
    rtd = math.sqrt(p.young) / (10e3 * math.sqrt(2 * (1 + p.nu0) * phys.rhoi))
    expected = (1.0 - dcrit) * dt * rtd
    np.testing.assert_allclose(d, expected, rtol=1e-4)
    # stress relaxed by the same factor
    np.testing.assert_allclose(float(sig[2, 0, 0]), sigma_s * (1 - expected), rtol=1e-4)


def test_bbm_healing():
    p = BBMParams()
    dt = 100.0
    trelax = _cellful(1e4)
    sig, dmg = bbm_update(
        jnp.zeros((3, 2, 2)), _cellful(0.5), _cellful(1.0), _cellful(1.0),
        _cellful(1e9), trelax, _cellful(0.0), _cellful(0.0), _cellful(0.0),
        10e3, dt, p,
    )
    # healing: damage -= dt/trelax * expC (expC=1 at conc=1)
    np.testing.assert_allclose(float(dmg[0, 0]), 0.5 - dt / 1e4, rtol=1e-5)


def test_mevp_converges_toward_vp_stress():
    """Repeated mEVP iterations with fixed strain converge to the VP stress:
    sigma1 -> zeta*(eps1-delta), etc. (Hibler ellipse)."""
    p = EVPParams()
    eps11 = _cellful(-1e-6)
    eps22 = _cellful(-2e-6)
    eps12 = _cellful(5e-7)
    conc = _cellful(1.0)
    thick = _cellful(1.0)
    sigma = jnp.zeros((3, 2, 2))
    alpha = 100.0
    for _ in range(3000):
        sigma = mevp_update(sigma, conc, thick, eps11, eps22, eps12, alpha, p)
    e1 = float(eps11[0, 0] + eps22[0, 0])
    e2 = float(eps11[0, 0] - eps22[0, 0])
    re2 = 1 / p.e**2
    delta = math.sqrt(e1 * e1 + (e2 * e2 + 4 * float(eps12[0, 0]) ** 2) * re2)
    P = p.Pstar  # conc=1
    zeta = P / (delta + p.delta_min)
    s1 = zeta * (e1 - delta)
    s2 = zeta * e2 * re2
    s12 = zeta * float(eps12[0, 0]) * re2
    np.testing.assert_allclose(float(sigma[0, 0, 0]), 0.5 * (s1 + s2), rtol=1e-3)
    np.testing.assert_allclose(float(sigma[1, 0, 0]), 0.5 * (s1 - s2), rtol=1e-3)
    np.testing.assert_allclose(float(sigma[2, 0, 0]), s12, rtol=1e-3)


def test_evp_zero_thickness_zero_stress():
    p = EVPParams()
    sigma = jnp.ones((3, 2, 2))
    out = evp_update(
        sigma, _cellful(1.0), _cellful(0.0), _cellful(1e-6), _cellful(0.0),
        _cellful(0.0), 1.0, 120.0, p,
    )
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_bbm_no_nan_at_plastic_cap_with_heavy_damage():
    """Regression for the float32 0/0 found in the 10-day pan-Arctic run:
    heavily damaged low-concentration ice makes ((1-d)*expC)^(alpha-1)
    underflow to zero, and with tildeP capped at exactly 1 the stress
    multiplicator was 0/0 = NaN. Exact field values from the crash cell."""
    p = BBMParams()
    sigma = jnp.stack([
        _cellful(-1.8252746e-06), _cellful(1.4093524e-06), _cellful(2.8479124e-07),
    ])
    sig, dmg = bbm_update(
        sigma, _cellful(0.9876946806907654), _cellful(0.12579339742660522),
        _cellful(0.18534128367900848), _cellful(8133.779296875),
        _cellful(2160000.0),
        _cellful(-3.1374308946396923e-06), _cellful(3.916044533980312e-06),
        _cellful(3.893068196703098e-07),
        10e3, 200.0 / 120.0, p,
    )
    assert np.isfinite(np.asarray(sig)).all()
    assert np.isfinite(np.asarray(dmg)).all()
    # the plastic-capped branch keeps the (tiny) elastic stress rather than
    # zeroing or exploding it
    assert abs(float(sig[0, 0, 0])) < 1.0


def test_bbm_fuzz_finite(rng):
    """BBM stays finite across rough random states incl. damage ~ 1 and
    conc at the rheology floor."""
    p = BBMParams()
    n = 64
    U = lambda lo, hi: jnp.asarray(rng.uniform(lo, hi, (n, n)).astype(np.float32))
    sigma = jnp.stack([U(-1e6, 1e6), U(-1e6, 1e6), U(-5e5, 5e5)])
    sig, dmg = bbm_update(
        sigma, U(0.0, 0.999999), U(0.0, 1.0), U(0.0, 4.0), U(1e3, 1e5),
        U(1e3, 1e12), U(-1e-4, 1e-4), U(-1e-4, 1e-4), U(-1e-4, 1e-4),
        10e3, 200.0 / 120.0, p,
    )
    assert np.isfinite(np.asarray(sig)).all()
    assert np.isfinite(np.asarray(dmg)).all()
    assert float(np.asarray(dmg).min()) >= 0.0
