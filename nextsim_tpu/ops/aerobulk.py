"""Ocean-atmosphere turbulent bulk-flux algorithms (the AeroBulk family).

The reference optionally links the external AeroBulk Fortran library and
dispatches ``thermo.ocean_bulk_formula`` over five named algorithms
(reference: model/finiteelement.cpp:1254-1263 str2oblk map; the call site
OWBulkFluxes #ifdef AEROBULK path, fe.cpp:5041-5100). This module
re-implements those algorithms natively as branch-free JAX so the same
option names select the same published formulations:

* ``coare3.0`` — Fairall et al. (2003): wind-ramped Charnock, roughness-
  Reynolds scalar roughness, Kansas/free-convection blended stability
  functions, convective gustiness.
* ``coare3.6`` — Edson et al. (2013): linear-in-wind Charnock and the
  updated scalar-roughness power law; same stability functions as 3.0.
* ``ncar``     — Large & Yeager (2009): polynomial neutral 10-m transfer
  coefficients, stability/height adjustment with Paulson psi functions.
* ``ecmwf``    — IFS documentation (Cy31+): viscous + Charnock roughness,
  fixed viscous scalar roughnesses, Beljaars & Holtslag (1991) stable
  stability functions, convective gustiness.
* ``andreas``  — Andreas et al. (2015): u* parameterised directly from the
  neutral 10-m wind (their Eq. 4.2 hyperbolic fit); scalar roughness via
  the COARE roughness-Reynolds law (the library pairs the Andreas momentum
  closure with an LKB-style scalar law; documented approximation here).

Every scheme runs a fixed-count Monin-Obukhov fixed-point iteration
(branch-free, jit-friendly — no data-dependent convergence loop). The
returned scales follow the host model's sign conventions (see
ops/thermo.py ow_bulk_fluxes): ``tstar = kappa*dtheta_air_minus_surface /
(ln - psi_h)`` so sensible heat flux upward is ``-rho*cpa*ustar*tstar``.
"""

from __future__ import annotations

import jax.numpy as jnp

from nextsim_tpu.core import constants as phys

NU_AIR = 1.5e-5  # kinematic viscosity of air [m2/s]
_EPS = 1e-8


# ---------------------------------------------------------------------------
# stability (psi) function families
# ---------------------------------------------------------------------------

def _psi_m_paulson(z):
    """Paulson (1970) momentum psi: Kansas unstable, linear stable."""
    x = (1.0 - 16.0 * jnp.minimum(z, 0.0)) ** 0.25
    unstable = (
        2.0 * jnp.log(0.5 * (1.0 + x))
        + jnp.log(0.5 * (1.0 + x * x))
        - 2.0 * jnp.arctan(x)
        + 0.5 * jnp.pi
    )
    return jnp.where(z < 0.0, unstable, -5.0 * jnp.maximum(z, 0.0))


def _psi_h_paulson(z):
    x = jnp.sqrt(jnp.abs(1.0 - 16.0 * jnp.minimum(z, 0.0)))
    unstable = 2.0 * jnp.log(0.5 * (1.0 + x))
    return jnp.where(z < 0.0, unstable, -5.0 * jnp.maximum(z, 0.0))


def _psi_m_coare(z):
    """COARE blended psi_m (Fairall et al. 2003, Eq. A3/A4)."""
    zn = jnp.minimum(z, 0.0)
    x = (1.0 - 15.0 * zn) ** 0.25
    psik = (
        2.0 * jnp.log(0.5 * (1.0 + x))
        + jnp.log(0.5 * (1.0 + x * x))
        - 2.0 * jnp.arctan(x)
        + 0.5 * jnp.pi
    )
    y = (1.0 - 10.15 * zn) ** (1.0 / 3.0)
    psic = (
        1.5 * jnp.log((1.0 + y + y * y) / 3.0)
        - jnp.sqrt(3.0) * jnp.arctan((1.0 + 2.0 * y) / jnp.sqrt(3.0))
        + jnp.pi / jnp.sqrt(3.0)
    )
    f = zn * zn / (1.0 + zn * zn)
    unstable = (1.0 - f) * psik + f * psic
    zp = jnp.maximum(z, 0.0)
    c = jnp.minimum(50.0, 0.35 * zp)
    stable = -((1.0 + zp) + 0.6667 * (zp - 14.28) * jnp.exp(-c) + 8.525)
    return jnp.where(z < 0.0, unstable, stable)


def _psi_h_coare(z):
    zn = jnp.minimum(z, 0.0)
    x = jnp.sqrt(jnp.abs(1.0 - 15.0 * zn))
    psik = 2.0 * jnp.log(0.5 * (1.0 + x))
    y = (1.0 - 34.15 * zn) ** (1.0 / 3.0)
    psic = (
        1.5 * jnp.log((1.0 + y + y * y) / 3.0)
        - jnp.sqrt(3.0) * jnp.arctan((1.0 + 2.0 * y) / jnp.sqrt(3.0))
        + jnp.pi / jnp.sqrt(3.0)
    )
    f = zn * zn / (1.0 + zn * zn)
    unstable = (1.0 - f) * psik + f * psic
    zp = jnp.maximum(z, 0.0)
    c = jnp.minimum(50.0, 0.35 * zp)
    stable = -(
        (1.0 + 2.0 * zp / 3.0) ** 1.5 + 0.6667 * (zp - 14.28) * jnp.exp(-c) + 8.525
    )
    return jnp.where(z < 0.0, unstable, stable)


# Beljaars & Holtslag (1991) stable forms used by the IFS
_BH_A, _BH_B, _BH_C, _BH_D = 1.0, 2.0 / 3.0, 5.0, 0.35


def _psi_m_ecmwf(z):
    zn = jnp.minimum(z, 0.0)
    x = (1.0 - 16.0 * zn) ** 0.25
    unstable = (
        2.0 * jnp.log(0.5 * (1.0 + x))
        + jnp.log(0.5 * (1.0 + x * x))
        - 2.0 * jnp.arctan(x)
        + 0.5 * jnp.pi
    )
    zp = jnp.maximum(z, 0.0)
    stable = -(
        _BH_A * zp
        + _BH_B * (zp - _BH_C / _BH_D) * jnp.exp(-jnp.minimum(_BH_D * zp, 50.0))
        + _BH_B * _BH_C / _BH_D
    )
    return jnp.where(z < 0.0, unstable, stable)


def _psi_h_ecmwf(z):
    zn = jnp.minimum(z, 0.0)
    x = jnp.sqrt(jnp.abs(1.0 - 16.0 * zn))
    unstable = 2.0 * jnp.log(0.5 * (1.0 + x))
    zp = jnp.maximum(z, 0.0)
    stable = -(
        (1.0 + 2.0 * _BH_A * zp / 3.0) ** 1.5
        + _BH_B * (zp - _BH_C / _BH_D) * jnp.exp(-jnp.minimum(_BH_D * zp, 50.0))
        + _BH_B * _BH_C / _BH_D
        - 1.0
    )
    return jnp.where(z < 0.0, unstable, stable)


# ---------------------------------------------------------------------------
# per-scheme roughness closures: (ustar, u10n) -> (z0, z0t, z0q)
# ---------------------------------------------------------------------------

def _rough_coare30(ustar, u10n):
    charn = jnp.clip(0.011 + (0.018 - 0.011) * (u10n - 10.0) / 8.0, 0.011, 0.018)
    us = jnp.maximum(ustar, 1e-4)
    z0 = charn * us * us / phys.g + 0.11 * NU_AIR / us
    rr = z0 * us / NU_AIR
    z0q = jnp.minimum(1.15e-4, 5.5e-5 * rr ** -0.6)
    return z0, z0q, z0q  # COARE 3.0 uses the same scalar roughness for t and q


def _rough_coare36(ustar, u10n):
    # Edson et al. (2013): Charnock linear in wind, capped (AeroBulk coare3p6)
    charn = jnp.clip(0.0017 * u10n - 0.005, 0.011, 0.028)
    us = jnp.maximum(ustar, 1e-4)
    z0 = charn * us * us / phys.g + 0.11 * NU_AIR / us
    rr = z0 * us / NU_AIR
    z0q = jnp.minimum(1.6e-4, 5.8e-5 * rr ** -0.72)
    return z0, z0q, z0q


def _rough_ecmwf(ustar, u10n):
    us = jnp.maximum(ustar, 1e-4)
    z0 = 0.11 * NU_AIR / us + 0.018 * us * us / phys.g
    z0t = 0.40 * NU_AIR / us
    z0q = 0.62 * NU_AIR / us
    return z0, z0t, z0q


def _ustar_andreas(u10n):
    """Andreas et al. (2015) Eq. 4.2: friction velocity directly from the
    neutral 10-m wind (hyperbolic fit through the low/high-wind regimes)."""
    w = u10n - 8.271
    return 0.239 + 0.0433 * (w + jnp.sqrt(0.12 * w * w + 0.181))


_SCHEMES = ("coare3.0", "coare3.6", "ncar", "ecmwf", "andreas")


def turbulent_scales(
    scheme: str,
    u,
    sst,
    tair,
    sphuma,
    sphumw,
    zu: float = 10.0,
    zt: float = 2.0,
    n_iter: int = 6,
):
    """Monin-Obukhov scales (ustar, tstar, qstar) + transfer coefficients.

    Parameters use the host model's conventions (ops/thermo.py): ``sst`` and
    ``tair`` in deg C, ``u`` the wind speed at ``zu``. The air-surface
    gradients are ``dtheta = tair + Gamma_d*zt - sst`` (potential) and
    ``dq = sphuma - sphumw``; the returned scales satisfy
    ``Qsh_up = -rho*cpa*ustar*tstar`` and ``Qlh_up = -rho*Lv*ustar*qstar``.

    Returns dict(ustar, tstar, qstar, cd, ch, ce, u10n).
    """
    if scheme not in _SCHEMES:
        raise ValueError(f"unknown aerobulk scheme {scheme!r} (allowed: {_SCHEMES})")

    kv = phys.vonKarman
    g = phys.g
    u = jnp.maximum(u, 0.1)
    tairK = tair + phys.tfrwK
    dtheta = tair + phys.Gamma_d * zt - sst  # air minus surface, potential
    dq = sphuma - sphumw
    tv = tairK * (1.0 + 0.61 * sphuma)  # virtual temperature

    if scheme == "ncar":
        return _ncar_scales(u, dtheta, dq, tv, sphuma, tairK, zu, zt, n_iter)

    rough = {
        "coare3.0": _rough_coare30,
        "coare3.6": _rough_coare36,
        "ecmwf": _rough_ecmwf,
        "andreas": _rough_coare30,  # scalar roughness stand-in (see module doc)
    }[scheme]
    psi_m, psi_h = {
        "coare3.0": (_psi_m_coare, _psi_h_coare),
        "coare3.6": (_psi_m_coare, _psi_h_coare),
        "ecmwf": (_psi_m_ecmwf, _psi_h_ecmwf),
        "andreas": (_psi_m_paulson, _psi_h_paulson),
    }[scheme]
    # convective gustiness (Fairall et al. 1996): beta*(Bf*zi)^(1/3)
    gust_beta, gust_zi = {
        "coare3.0": (1.2, 600.0),
        "coare3.6": (1.2, 600.0),
        "ecmwf": (1.0, 1000.0),
        "andreas": (0.0, 600.0),
    }[scheme]

    ustar = 0.035 * u
    tstar = jnp.zeros_like(u)
    qstar = jnp.zeros_like(u)
    u10n = u
    ublend = u
    for _ in range(n_iter):
        z0, z0t, z0q = rough(ustar, u10n)
        wflux = tstar * (1.0 + 0.61 * sphuma) + 0.61 * tairK * qstar
        L = tv * ustar * ustar / (
            kv * g * jnp.where(jnp.abs(wflux) > 1e-12, wflux, 1e-12)
        )
        zeta_u = jnp.clip(zu / L, -10.0, 10.0)
        zeta_t = jnp.clip(zt / L, -10.0, 10.0)
        if gust_beta > 0.0:
            bf = jnp.maximum(-g / tv * ustar * wflux, 1e-9)
            ug = gust_beta * (bf * gust_zi) ** (1.0 / 3.0)
            ublend = jnp.sqrt(u * u + ug * ug)
        cd_sqrt = kv / (jnp.log(zu / z0) - psi_m(zeta_u))
        ch_fac = kv / (jnp.log(zt / jnp.maximum(z0t, 1e-9)) - psi_h(zeta_t))
        ce_fac = kv / (jnp.log(zt / jnp.maximum(z0q, 1e-9)) - psi_h(zeta_t))
        if scheme == "andreas":
            ustar = jnp.maximum(_ustar_andreas(u10n), 1e-4)
        else:
            ustar = jnp.maximum(cd_sqrt * ublend, 1e-4)
        tstar = ch_fac * dtheta
        qstar = ce_fac * dq
        # neutral 10-m wind anchored on the measured wind at zu:
        # u(zu) = ustar/kv*(ln(zu/z0) - psi_m)  =>  subtract the height and
        # stability corrections rather than re-deriving from z0 alone (which
        # need not be self-consistent for the Andreas u* closure)
        u10n = jnp.maximum(
            ublend - ustar / kv * (jnp.log(zu / 10.0) - psi_m(zeta_u)), 0.1
        )

    cd = (ustar / ublend) ** 2
    ch = (ustar / ublend) * ch_fac
    ce = (ustar / ublend) * ce_fac
    return dict(ustar=ustar, tstar=tstar, qstar=qstar, cd=cd, ch=ch, ce=ce, u10n=u10n)


def _ncar_scales(u, dtheta, dq, tv, sphuma, tairK, zu, zt, n_iter):
    """Large & Yeager (2009) NCAR/CORE-II algorithm: polynomial neutral 10-m
    coefficients adjusted to height/stability with Paulson psi functions."""
    kv = phys.vonKarman
    g = phys.g
    u = jnp.maximum(u, 0.5)  # LY04 floor

    def cd_n10(w):
        w = jnp.clip(w, 0.5, 33.0)
        return 1e-3 * (2.7 / w + 0.142 + w / 13.09 - 3.14807e-10 * w ** 6)

    u10n = u
    ustar = jnp.sqrt(cd_n10(u10n)) * u
    tstar = jnp.zeros_like(u)
    qstar = jnp.zeros_like(u)
    cd = cd_n10(u10n)
    ch = cd
    ce = cd
    for _ in range(n_iter):
        cdn = cd_n10(u10n)
        cen = 1e-3 * 34.6 * jnp.sqrt(cdn)
        stable = dtheta > 0.0
        chn = 1e-3 * jnp.where(stable, 18.0, 32.7) * jnp.sqrt(cdn)

        wflux = tstar * (1.0 + 0.61 * sphuma) + 0.61 * tairK * qstar
        L = tv * ustar * ustar / (
            kv * g * jnp.where(jnp.abs(wflux) > 1e-12, wflux, 1e-12)
        )
        zeta_u = jnp.clip(zu / L, -10.0, 10.0)
        zeta_t = jnp.clip(zt / L, -10.0, 10.0)
        pm, ph = _psi_m_paulson(zeta_u), _psi_h_paulson(zeta_t)

        cdn_sqrt = jnp.sqrt(cdn)
        den_m = 1.0 + cdn_sqrt / kv * (jnp.log(zu / 10.0) - pm)
        cd = cdn / (den_m * den_m)
        cd_sqrt = jnp.sqrt(cd)
        den_h = 1.0 + chn / (kv * cdn_sqrt) * (jnp.log(zt / 10.0) - ph)
        ch = chn * cd_sqrt / cdn_sqrt / den_h
        den_e = 1.0 + cen / (kv * cdn_sqrt) * (jnp.log(zt / 10.0) - ph)
        ce = cen * cd_sqrt / cdn_sqrt / den_e

        ustar = jnp.maximum(cd_sqrt * u, 1e-4)
        tstar = ch / cd_sqrt * dtheta
        qstar = ce / cd_sqrt * dq
        u10n = jnp.maximum(u / den_m, 0.5)

    return dict(ustar=ustar, tstar=tstar, qstar=qstar, cd=cd, ch=ch, ce=ce, u10n=u10n)
