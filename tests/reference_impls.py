"""Literal (slow, loop-based) numpy re-implementations of the
reference framework's native kernels, used ONLY as test oracles.

These follow the published algorithm definitions (Buades et al. 2011
non-local means; Conradsen et al. 2016 omnibus change detection) with
the exact conventions of the reference's Cython kernels
(/root/reference/nd/_filters.pyx, /root/reference/nd/_change.pyx):
reflect indexing, weight formulas, iterative change-point scan.
"""

import numpy as np
from scipy.stats import chi2 as _chi2


def _idx_reflect(i, n):
    if i < 0:
        return -i
    if i >= n:
        return 2 * n - 2 - i
    return i


def nlmeans_oracle(arr, r, f, sigma, h, n_eff=-1.0):
    """Pixelwise NLMeans over (d0, d1, d2, var), literal loops."""
    arr = np.asarray(arr, dtype=np.float64)
    N = arr.shape[:3]
    nvars = arr.shape[3]
    r = [int(v) for v in r]
    f = [int(v) for v in f]
    dsq_norm = nvars * (2 * f[0] + 1) * (2 * f[1] + 1) * (2 * f[2] + 1)
    out = np.zeros_like(arr)

    for p0 in range(N[0]):
        for p1 in range(N[1]):
            for p2 in range(N[2]):
                total_w = 0.0
                total_sq_w = 0.0
                max_w = 0.0
                wsum = np.zeros(nvars)
                for q0 in range(p0 - r[0], p0 + r[0] + 1):
                    for q1 in range(p1 - r[1], p1 + r[1] + 1):
                        for q2 in range(p2 - r[2], p2 + r[2] + 1):
                            if (q0, q1, q2) == (p0, p1, p2):
                                continue
                            dsq = 0.0
                            for d0 in range(-f[0], f[0] + 1):
                                for d1 in range(-f[1], f[1] + 1):
                                    for d2 in range(-f[2], f[2] + 1):
                                        a = arr[
                                            _idx_reflect(p0 + d0, N[0]),
                                            _idx_reflect(p1 + d1, N[1]),
                                            _idx_reflect(p2 + d2, N[2])]
                                        b = arr[
                                            _idx_reflect(q0 + d0, N[0]),
                                            _idx_reflect(q1 + d1, N[1]),
                                            _idx_reflect(q2 + d2, N[2])]
                                        dsq += ((a - b) ** 2).sum()
                            dsq /= dsq_norm
                            w = np.exp(-max(dsq - 2 * sigma ** 2, 0)
                                       / h ** 2)
                            total_w += w
                            total_sq_w += w * w
                            max_w = max(max_w, w)
                            wsum += w * arr[_idx_reflect(q0, N[0]),
                                            _idx_reflect(q1, N[1]),
                                            _idx_reflect(q2, N[2])]
                if n_eff < 0:
                    w = max_w if max_w > 0 else 1.0
                else:
                    rt = np.sqrt(n_eff * total_w ** 2
                                 - n_eff ** 2 * total_sq_w
                                 + n_eff * total_sq_w)
                    w = (total_w + rt) / (n_eff - 1)
                total_w += w
                wsum += w * arr[p0, p1, p2]
                out[p0, p1, p2] = wsum / total_w
    return out


# ---------------------------------------------------------------------------
# Omnibus change detection (Conradsen et al. 2016), dual-pol p=2
# ---------------------------------------------------------------------------

def omnibus_probability(ts, n):
    """P-value surrogate: chi2 CDF of -2 rho logQ with omega2 correction.

    ``ts``: (k, 4) array of [C11, C12.re, C12.im, C22] per time step.
    """
    p = 2.0
    k = ts.shape[0]
    dets = ts[:, 0] * ts[:, 3] - (ts[:, 1] ** 2 + ts[:, 2] ** 2)
    sums = ts.sum(axis=0)
    det_of_sum = sums[0] * sums[3] - (sums[1] ** 2 + sums[2] ** 2)
    with np.errstate(invalid='ignore'):
        # negative determinants propagate NaN, matching the device kernels
        logQ = n * (p * k * np.log(k) + np.log(dets.prod())
                    - k * np.log(det_of_sum))
    rho = 1 - (2 * p ** 2 - 1) / (6 * (k - 1) * p) * (k / n - 1 / (n * k))
    z = -2 * rho * logQ
    ff = (k - 1) * p ** 2
    omega2 = (p ** 2 * (p ** 2 - 1) / (24 * rho ** 2)
              * (k / n ** 2 - 1 / (n * k) ** 2)
              - p ** 2 * (k - 1) / 4 * (1 - 1 / rho) ** 2)
    P1 = _chi2.cdf(z, ff)
    P2 = _chi2.cdf(z, ff + 4)
    return P1 + omega2 * (P2 - P1)


def single_pixel_change_oracle(ts, alpha, n):
    """Iterative change-point detection for one pixel (k, 4)."""
    k = ts.shape[0]
    result = np.zeros(k, dtype=bool)
    el = 0
    while True:
        p_H0_l = omnibus_probability(ts[el:], n)
        if not (p_H0_l > alpha):
            break
        r = None
        for j in range(2, k - el + 1):
            p = omnibus_probability(ts[el:el + j], n)
            r = j - 1
            if p > alpha:
                result[el + r] = True
                break
        if r is None:
            break
        el = el + r
        if el >= k - 1:
            break
    return result


def change_detection_oracle(values, alpha, n):
    """(y, x, time, 4) -> (y, x, time) boolean change map."""
    ny, nx, k, _ = values.shape
    out = np.zeros((ny, nx, k), dtype=bool)
    for i in range(ny):
        for j in range(nx):
            out[i, j] = single_pixel_change_oracle(
                values[i, j].astype(np.float64), alpha, n)
    return out
