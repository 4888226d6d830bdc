"""Kinetic-energy power spectra.

Scope of reference ``src/Common/Spectra/``: power_spectrum_3d (LES,
power_spectrum_les.jl:13 — shell-binned 3-D FFT), power_spectrum_1d (GCM,
power_spectrum_gcm.jl:4-20 — zonal FFT per latitude ring).

Vectorized numpy/jnp: the shell binning is a bincount over integer radii
(no triple loops).
"""

from __future__ import annotations

import numpy as np


def power_spectrum_3d(u, v, w, L):
    """Shell-averaged KE spectrum of equispaced 3-D fields [N, N, N].

    Returns (k, spectrum): wavenumbers (rad/m) and binned KE density."""
    u, v, w = (np.asarray(x) for x in (u, v, w))
    N = u.shape[0]
    mu = np.abs(np.fft.fftn(u)) / N ** 3
    mv = np.abs(np.fft.fftn(v)) / N ** 3
    mw = np.abs(np.fft.fftn(w)) / N ** 3
    E = mu ** 2 + mv ** 2 + mw ** 2

    freq = np.fft.fftfreq(N, d=1.0 / N)          # integer wavenumbers
    KX, KY, KZ = np.meshgrid(freq, freq, freq, indexing="ij")
    r = np.sqrt(KX ** 2 + KY ** 2 + KZ ** 2)
    k_nyq = N // 2
    shell = np.clip(np.round(r).astype(int), 0, k_nyq)
    spectrum = np.bincount(shell.reshape(-1), weights=E.reshape(-1),
                           minlength=k_nyq + 1)[1:k_nyq + 1]
    dk = 2 * np.pi / L
    k = np.arange(1, k_nyq + 1) * dk
    return k, spectrum


def power_spectrum_1d(u, lat_weights=None):
    """Zonal (per-latitude-ring) spectrum of u [nlat, nlon(, nlev)]
    (reference power_spectrum_gcm.jl): returns [nlat, nlon//2(, nlev)]
    power per zonal wavenumber, optionally latitude-averaged."""
    u = np.asarray(u)
    nlon = u.shape[1]
    uf = np.fft.fft(u, axis=1) / nlon
    p = np.abs(uf) ** 2
    half = p[:, 1:nlon // 2 + 1] * 2.0
    if lat_weights is not None:
        wsum = np.sum(lat_weights)
        half = np.tensordot(lat_weights / wsum, half, axes=(0, 0))
    return half
