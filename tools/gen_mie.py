"""Generate the Lorenz-Mie phase-function tables used by the renderer.

The reference ships an 8.2k-line tabulated Mie phase function plus a
"chopped" variant with the forward diffraction spike truncated
(reference: DG/src/Mie.cpp:8 (mie[]), :4107 (choppedMie[]), samplers
:8206-8298).  We do NOT copy those tables; instead this tool computes the
phase function from first principles:

- Bohren & Huffman Mie series (logarithmic-derivative downward recurrence
  for a_n/b_n, upward pi_n/tau_n recurrence over the angle grid),
- water droplets (m = 1.331 + 1.3e-9 i at 550 nm),
- averaged over a BIMODAL modified-gamma cumulus droplet-size distribution
  (a narrow small-droplet mode + a broad large mode; parameters below),
  r in micrometers,
- tabulated on a uniform cos(theta) grid with 4096 entries over [-1, 1]
  (same resolution/indexing convention as the reference's 1D texture).

The distribution parameters were FITTED to the reference's published curve
shape, not copied: a Nelder-Mead fit of the 5 mixture parameters minimizing
the inverse-CDF scatter-angle discrepancy (the sampling-critical statistic)
with penalties holding the asymmetry parameter and the body curve shape.
Round 4 shipped a single-mode gamma (alpha=6, r_mode=10.5 um; max angular
error 2.52 deg, concentrated at the flat-phase 100-deg region and the
backscatter glory); the round-5 bimodal fit reaches max 0.28 deg /
p99 0.24 deg / median 0.16 deg with g matched to 4 decimals (0.9750) and
body log-RMS 0.057.  ``tools/validate_mie.py`` re-measures all of these
against the reference tables and writes MIE_VALIDATION.json;
``tests/test_mie_validation.py`` pins the derived anchors.

The "chopped" variant clamps the forward peak at ~13.96x the backscatter
value — the same cap-to-backscatter ratio observable in the reference's raw
tables (choppedMie max 9.9666 vs mie[0] = 0.7136) — which removes the
under-resolved diffraction spike so it can be used for direction sampling
and deep-bounce phase evaluation.  With the fitted distribution the clamp
engages over bins 4082..4095 vs the reference's 4081..4095 and removes
89.94% of the scattered energy vs the reference's 89.98%.

Output: deepestscatter_tpu/assets/mie_4096.npz with arrays
  cos_theta [N], mie_raw [N], chopped_raw [N]
(raw = unnormalized; normalization to mean 1 happens at load, mirroring
the reference's getPhaseSampler).
"""

from __future__ import annotations

import os

import numpy as np

N_TABLE = 4096
WAVELENGTH_UM = 0.550
M_WATER = 1.331 + 1.3e-9j
CHOP_TO_BACKSCATTER_RATIO = 9.9666332937 / 0.7136052853  # ~13.96


def mie_intensity(x: float, m: complex, mu: np.ndarray) -> np.ndarray:
    """Unpolarized scattered intensity (|S1|^2 + |S2|^2)/2 for size param x.

    Standard Bohren-Huffman: D_n by downward recurrence, Riccati-Bessel
    psi/chi upward, a_n/b_n, then S1/S2 sums with pi_n/tau_n recurrences.
    Vectorized over the cos(theta) grid ``mu``.
    """
    n_max = int(np.ceil(x + 4.0 * x ** (1.0 / 3.0) + 2.0))
    n_mx = max(n_max, int(np.ceil(abs(m * x)))) + 16

    # Logarithmic derivative D_n(mx), downward recurrence.
    mx = m * x
    d = np.zeros(n_mx + 1, dtype=np.complex128)
    for n in range(n_mx, 0, -1):
        d[n - 1] = n / mx - 1.0 / (d[n] + n / mx)

    # Riccati-Bessel psi_n(x), chi_n(x) upward.
    psi_m1, psi_0 = np.cos(x), np.sin(x)  # psi_{-1}, psi_0
    chi_m1, chi_0 = -np.sin(x), np.cos(x)  # chi_{-1}, chi_0
    a = np.zeros(n_max + 1, dtype=np.complex128)
    b = np.zeros(n_max + 1, dtype=np.complex128)
    psi_nm1, psi_n = psi_m1, psi_0
    chi_nm1, chi_n = chi_m1, chi_0
    for n in range(1, n_max + 1):
        psi_np1 = (2 * n - 1) / x * psi_n - psi_nm1
        chi_np1 = (2 * n - 1) / x * chi_n - chi_nm1
        psi_nm1, psi_n = psi_n, psi_np1
        chi_nm1, chi_n = chi_n, chi_np1
        zeta_n = psi_n + 1j * chi_n
        zeta_nm1 = psi_nm1 + 1j * chi_nm1
        dn = d[n]
        a[n] = ((dn / m + n / x) * psi_n - psi_nm1) / ((dn / m + n / x) * zeta_n - zeta_nm1)
        b[n] = ((dn * m + n / x) * psi_n - psi_nm1) / ((dn * m + n / x) * zeta_n - zeta_nm1)

    # Angular functions pi_n, tau_n and amplitude sums.
    s1 = np.zeros_like(mu, dtype=np.complex128)
    s2 = np.zeros_like(mu, dtype=np.complex128)
    pi_nm1 = np.zeros_like(mu)  # pi_0
    pi_n = np.ones_like(mu)  # pi_1
    for n in range(1, n_max + 1):
        tau_n = n * mu * pi_n - (n + 1) * pi_nm1
        f = (2 * n + 1) / (n * (n + 1))
        s1 += f * (a[n] * pi_n + b[n] * tau_n)
        s2 += f * (a[n] * tau_n + b[n] * pi_n)
        pi_np1 = ((2 * n + 1) * mu * pi_n - (n + 1) * pi_nm1) / n
        pi_nm1, pi_n = pi_n, pi_np1

    return 0.5 * (np.abs(s1) ** 2 + np.abs(s2) ** 2)


#: Bimodal modified-gamma mixture (see module docstring for the fit):
#: a narrow ~5.6 um mode plus a broad ~9.1 um mode, mixed ~50/50 —
#: plausible cumulus microphysics (fresh condensation + grown droplets).
DROPLET_MODES = (
    # (weight, alpha, r_mode_um)
    (0.4951, 9.3232, 5.5648),
    (0.5049, 3.3731, 9.1167),
)


def droplet_distribution(r_um: np.ndarray) -> np.ndarray:
    """Bimodal modified-gamma cumulus droplet number density:
    sum_i w_i * normalize(r^alpha_i exp(-alpha_i r / r_mode_i))."""
    out = np.zeros_like(r_um, dtype=np.float64)
    for w, alpha, mode in DROPLET_MODES:
        comp = r_um**alpha * np.exp(-alpha * r_um / mode)
        out += w * comp / comp.sum()
    return out


def compute_tables(n_table: int = N_TABLE):
    cos_theta = np.linspace(-1.0, 1.0, n_table)
    radii = np.linspace(0.3, 45.0, 96)
    weights = droplet_distribution(radii)
    weights /= weights.sum()

    phase = np.zeros(n_table)
    for r, w in zip(radii, weights):
        if w < 1e-8:
            continue
        x = 2.0 * np.pi * r / WAVELENGTH_UM
        # Weight each droplet's differential scattering by number density;
        # the 1/k^2 factor is constant (single wavelength) and divides out
        # in the final normalization.
        phase += w * mie_intensity(x, M_WATER, cos_theta)

    mie_raw = phase
    cap = CHOP_TO_BACKSCATTER_RATIO * mie_raw[0]
    chopped_raw = np.minimum(mie_raw, cap)
    return cos_theta, mie_raw, chopped_raw


def main():
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "deepestscatter_tpu",
        "assets",
        "mie_4096.npz",
    )
    cos_theta, mie_raw, chopped_raw = compute_tables()
    np.savez_compressed(out, cos_theta=cos_theta, mie_raw=mie_raw, chopped_raw=chopped_raw)
    g = (cos_theta * mie_raw).sum() / mie_raw.sum()
    print(f"wrote {out}")
    print(f"  mean(mie_raw)={mie_raw.mean():.4f}  peak/mean={mie_raw.max() / mie_raw.mean():.1f}")
    print(f"  backscatter={mie_raw[0]:.4f}  chop cap={chopped_raw.max():.4f}")
    print(f"  asymmetry g~{g:.4f}")


if __name__ == "__main__":
    main()
