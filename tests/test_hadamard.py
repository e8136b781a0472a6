"""WHT butterfly parity with the popcount-parity definition."""

import numpy as np


def popcount16(v: np.ndarray) -> np.ndarray:
    bits = np.unpackbits(
        v.astype(np.uint16).view(np.uint8).reshape(*v.shape, 2), axis=-1)
    return bits.sum(axis=-1).astype(np.int64)


def brute_wht(x: np.ndarray) -> np.ndarray:
    n = x.shape[-1]
    k = np.arange(n)
    sign = 1 - 2 * (popcount16(k[:, None] & k[None, :]) % 2)
    return x @ sign.T.astype(np.int64)


def fast_wht(x: np.ndarray) -> np.ndarray:
    nb, n = x.shape
    a = x.copy()
    h = 1
    while h < n:
        a = a.reshape(nb, -1, 2, h)
        s = a[:, :, 0, :] + a[:, :, 1, :]
        d = a[:, :, 0, :] - a[:, :, 1, :]
        a = np.stack([s, d], axis=2)
        h *= 2
    return a.reshape(nb, n)


def test_wht_matches_definition():
    rng = np.random.default_rng(3)
    for n in (2, 8, 64, 256):
        x = rng.integers(-15000, 15001, (5, n)).astype(np.int64)
        np.testing.assert_array_equal(fast_wht(x), brute_wht(x))


def test_wht_parseval():
    # sum H_k^2 == n * sum x_t^2 (Parseval for the +-1 basis)
    rng = np.random.default_rng(4)
    x = rng.integers(-15000, 15001, (3, 256)).astype(np.int64)
    h = fast_wht(x)
    np.testing.assert_array_equal(
        (h * h).sum(axis=1), 256 * (x * x).sum(axis=1))
