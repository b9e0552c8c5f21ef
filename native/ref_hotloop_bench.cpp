// Measured CPU anchor for the reference's momentum hot loop.
//
// The reference executable cannot be built in this image (its Boost.MPI /
// NetCDF-C++ / Gmsh dependencies are not installed and installing packages
// is out of scope), so this standalone benchmark measures the rate of the
// hot loop itself — FiniteElement::explicitSolve's per-substep work
// (reference: model/finiteelement.cpp:10420-10573):
//
//   per element: P1 strain rates from B*v  (fe.cpp:4167-4176)
//              + BBM updateSigmaDamage     (fe.cpp:4137-4260)
//              + stress-divergence scatter to the 3 nodes (fe.cpp:10444-10468)
//   per node:   Hunke&Dukowicz implicit-drag 2x2 solve   (fe.cpp:10472-10529)
//
// on a structured triangulation (2 triangles per quad, the same element
// count as the operational ~10 km pan-Arctic meshes), in double precision
// with the same per-substep exp/pow transcendentals the reference computes
// per element per substep. This is an ORIGINAL implementation written from
// the formula set (the same one nextsim_tpu/ops/{rheology,momentum}.py
// transcribes); no reference code is copied.
//
// What it deliberately leaves out (all favor the reference, making the
// anchor conservative): per-substep MPI updateGhosts (fe.cpp:10534), the
// 50-sweep OW smoother, remeshing, thermo, forcing, and output.
//
// Build & run (see bench_anchor.py):
//   g++ -O3 -march=native -funroll-loops -o ref_hotloop_bench \
//       ref_hotloop_bench.cpp
//   ./ref_hotloop_bench [N=256] [substeps=120] [reps=3]
// Prints one JSON line with element-substeps/s (single core).

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <vector>

using std::size_t;

struct Params {
    // dynamics defaults (reference: model/options.cpp + initOptAndParam)
    double young = 5.9605e8;
    double nu0 = 1.0 / 3.0;
    double compaction_param = -20.0;
    double compr_strength = 1e10;  // scaled by scale_coef at init
    double tan_phi = 0.7;
    double compression_factor = 10e3;
    double exponent_compression_factor = 1.5;
    double lambda0 = 1e7;      // undamaged_time_relaxation_sigma
    double alpha = 5.0;        // exponent_relaxation_sigma
    double time_relaxation_damage = 25.0 * 86400.0;
    double rhoi = 917.0, rhow = 1025.0, rhoa = 1.3;
    double quad_drag_water = 0.0055, quad_drag_air = 0.0020;
    double ocean_turning_deg = 25.0;
    double fcor = 1.4e-4;      // ~Arctic Coriolis
    double u0 = 5e-5;
};

int main(int argc, char** argv) {
    const int N = argc > 1 ? std::atoi(argv[1]) : 256;
    const int substeps = argc > 2 ? std::atoi(argv[2]) : 120;
    const int reps = argc > 3 ? std::atoi(argv[3]) : 3;
    const double dt = 200.0;
    const double dte = dt / substeps;
    const double dx = 10e3;

    Params p;
    const int nn = (N + 1) * (N + 1);   // nodes
    const int ne = 2 * N * N;           // triangles

    // --- mesh: structured triangulation, per-element node ids + shape
    //     coefficients dN/dx, dN/dy (constant per P1 element) -------------
    std::vector<int> nid(3 * ne);
    std::vector<double> bx(3 * ne), by(3 * ne);
    const double area = 0.5 * dx * dx;
    for (int j = 0, t = 0; j < N; ++j) {
        for (int i = 0; i < N; ++i) {
            int n00 = j * (N + 1) + i, n01 = n00 + 1;
            int n10 = n00 + (N + 1), n11 = n10 + 1;
            // lower triangle (n00, n01, n10): right angle at n00
            nid[3 * t] = n00; nid[3 * t + 1] = n01; nid[3 * t + 2] = n10;
            bx[3 * t] = -1.0 / dx; bx[3 * t + 1] = 1.0 / dx; bx[3 * t + 2] = 0.0;
            by[3 * t] = -1.0 / dx; by[3 * t + 1] = 0.0; by[3 * t + 2] = 1.0 / dx;
            ++t;
            // upper triangle (n11, n10, n01)
            nid[3 * t] = n11; nid[3 * t + 1] = n10; nid[3 * t + 2] = n01;
            bx[3 * t] = 1.0 / dx; bx[3 * t + 1] = -1.0 / dx; bx[3 * t + 2] = 0.0;
            by[3 * t] = 1.0 / dx; by[3 * t + 1] = 0.0; by[3 * t + 2] = -1.0 / dx;
            ++t;
        }
    }

    // --- fields -----------------------------------------------------------
    std::vector<double> conc(ne, 0.95), thick(ne, 1.5), damage(ne, 0.0);
    std::vector<double> sxx(ne, 0.0), syy(ne, 0.0), sxy(ne, 0.0);
    std::vector<double> cohesion(ne);
    const double scale_coef = std::sqrt(0.1 / dx);  // fe.cpp:6996
    for (int e = 0; e < ne; ++e)
        cohesion[e] = 1.5e6 * scale_coef * (0.8 + 0.4 * ((e * 2654435761u >> 8 & 1023) / 1023.0));

    std::vector<double> vu(nn, 0.0), vv(nn, 0.0);
    std::vector<double> gu(nn), gv(nn);
    std::vector<double> node_mass(nn, p.rhoi * 1.5), rlmass(nn);
    std::vector<double> tau_ax(nn), tau_ay(nn);
    const double wind_u = 10.0, wind_v = -3.0;
    const double wspd = std::hypot(wind_u, wind_v);
    for (int n = 0; n < nn; ++n) {
        rlmass[n] = 3.0 / (6.0 * area);  // lumped A/3 per corner, ~6 elems/node
        double dragc = p.rhoa * p.quad_drag_air * wspd;
        tau_ax[n] = dragc * wind_u;
        tau_ay[n] = dragc * wind_v;
    }
    const double cos_ota = std::cos(p.ocean_turning_deg * M_PI / 180.0);
    const double sin_ota = std::sin(p.ocean_turning_deg * M_PI / 180.0);
    const double d0 = 1.0 / (1.0 - p.nu0 * p.nu0);
    const double d1 = d0 * p.nu0, d2 = d0 * (1.0 - p.nu0) / 2.0;
    const double rtd_const = dx * std::sqrt(2.0 * (1.0 + p.nu0) * p.rhoi);

    double best = 1e300;
    for (int rep = 0; rep < reps; ++rep) {
        std::fill(vu.begin(), vu.end(), 0.0);
        std::fill(vv.begin(), vv.end(), 0.0);
        std::fill(sxx.begin(), sxx.end(), 0.0);
        std::fill(syy.begin(), syy.end(), 0.0);
        std::fill(sxy.begin(), sxy.end(), 0.0);
        std::fill(damage.begin(), damage.end(), 0.0);
        auto t0 = std::chrono::steady_clock::now();
        for (int s = 0; s < substeps; ++s) {
            std::fill(gu.begin(), gu.end(), 0.0);
            std::fill(gv.begin(), gv.end(), 0.0);
            // ---- element loop: strain, BBM update, scatter --------------
            for (int e = 0; e < ne; ++e) {
                const int i0 = nid[3 * e], i1 = nid[3 * e + 1], i2 = nid[3 * e + 2];
                const double b0x = bx[3 * e], b1x = bx[3 * e + 1], b2x = bx[3 * e + 2];
                const double b0y = by[3 * e], b1y = by[3 * e + 1], b2y = by[3 * e + 2];
                const double e11 = b0x * vu[i0] + b1x * vu[i1] + b2x * vu[i2];
                const double e22 = b0y * vv[i0] + b1y * vv[i1] + b2y * vv[i2];
                const double e12 = 0.5 * (b0y * vu[i0] + b1y * vu[i1] + b2y * vu[i2]
                                        + b0x * vv[i0] + b1x * vv[i1] + b2x * vv[i2]);
                // BBM updateSigmaDamage (fe.cpp:4137-4260), per-substep
                // exp/pow exactly as the reference computes them
                const double expC = std::exp(p.compaction_param * (1.0 - conc[e]));
                const double dmg_el = (1.0 - damage[e]) * expC;
                const double time_viscous =
                    p.lambda0 * std::pow(std::max(dmg_el, 1e-12), p.alpha - 1.0);
                const double Pmax = p.compression_factor
                    * std::pow(thick[e], p.exponent_compression_factor) * expC;
                double sn = 0.5 * (sxx[e] + syy[e]);
                const double tildeP =
                    sn < 0.0 ? std::min(1.0, -Pmax / std::min(sn, -1e-30)) : 0.0;
                const double mult = std::min(1.0 - 1e-12,
                    time_viscous / (time_viscous + dte * (1.0 - tildeP)));
                const double elas = p.young * dmg_el * dte;
                double nxx = (sxx[e] + elas * (d0 * e11 + d1 * e22)) * mult;
                double nyy = (syy[e] + elas * (d1 * e11 + d0 * e22)) * mult;
                double nxy = (sxy[e] + elas * d2 * e12) * mult;
                // failure criterion + damage (fe.cpp:4216-4243)
                const double hd = 0.5 * (nxx - nyy);
                const double ss = std::sqrt(hd * hd + nxy * nxy);
                sn = 0.5 * (nxx + nyy);
                double dcrit;
                if (sn < -p.compr_strength)
                    dcrit = -p.compr_strength / std::min(sn, -1e-30);
                else
                    dcrit = cohesion[e] / std::max(ss + p.tan_phi * sn, 1e-30);
                if (dcrit > 0.0 && dcrit < 1.0) {
                    const double td = rtd_const / std::sqrt(p.young * dmg_el);
                    const double relax = (1.0 - dcrit) * dte / td;
                    damage[e] += (1.0 - damage[e]) * relax;
                    nxx *= 1.0 - relax; nyy *= 1.0 - relax; nxy *= 1.0 - relax;
                }
                damage[e] = std::max(0.0,
                    damage[e] - dte / p.time_relaxation_damage * expC);
                sxx[e] = nxx; syy[e] = nyy; sxy[e] = nxy;
                // gradient scatter (fe.cpp:10444-10468)
                const double vol = thick[e] * area;
                gu[i0] -= vol * (nxx * b0x + nxy * b0y);
                gu[i1] -= vol * (nxx * b1x + nxy * b1y);
                gu[i2] -= vol * (nxx * b2x + nxy * b2y);
                gv[i0] -= vol * (nxy * b0x + nyy * b0y);
                gv[i1] -= vol * (nxy * b1x + nyy * b1y);
                gv[i2] -= vol * (nxy * b2x + nyy * b2y);
            }
            // ---- node loop: H&D 2x2 implicit-drag solve (fe.cpp:10472) --
            for (int n = 0; n < nn; ++n) {
                const double du = -vu[n], dv = -vv[n];  // ocean at rest
                const double cprime =
                    p.rhow * p.quad_drag_water * std::sqrt(du * du + dv * dv);
                const double dom = dte / std::max(p.rhoi * 0.05, node_mass[n]);
                const double a = 1.0 + dom * cprime * cos_ota;
                const double b = dte * p.fcor + dom * cprime * sin_ota;
                const double rden = 1.0 / (a * a + b * b);
                const double tx = tau_ax[n];
                const double ty = tau_ay[n];
                const double gx = gu[n] * rlmass[n];
                const double gy = gv[n] * rlmass[n];
                const double nu_ = (a * vu[n] + b * vv[n]
                    + dom * (a * (gx + tx) + b * (gy + ty))) * rden;
                const double nv_ = (a * vv[n] - b * vu[n]
                    + dom * (a * (gy + ty) - b * (gx + tx))) * rden;
                vu[n] = nu_; vv[n] = nv_;
            }
        }
        auto t1 = std::chrono::steady_clock::now();
        double secs = std::chrono::duration<double>(t1 - t0).count();
        if (secs < best) best = secs;
    }

    const double rate = double(ne) * substeps / best;
    // guard against the loop being optimised away
    double chk = 0.0;
    for (int n = 0; n < nn; n += 97) chk += vu[n] + vv[n];
    std::printf(
        "{\"elements\": %d, \"substeps\": %d, \"seconds\": %.4f, "
        "\"element_substeps_per_s_core\": %.4e, \"check\": %.6e}\n",
        ne, substeps, best, rate, chk);
    return 0;
}
