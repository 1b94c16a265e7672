"""Memory-layout semantics (parity with the reference's view test,
reference: tests/image/test_image_order.py): reversing axis order is a
zero-copy view, and the NIfTI codec's Fortran-order convention round-trips
through it."""

import time

import numpy as np

from segmantic_tpu.image.utils import array_view_reverse_ordering


def test_reverse_ordering_is_view():
    x = np.arange(2 * 3 * 4).reshape(2, 3, 4)
    v = array_view_reverse_ordering(x)
    assert v.shape == (4, 3, 2)
    assert np.shares_memory(v, x)
    assert v[1, 2, 0] == x[0, 2, 1]
    # mutating the view mutates the original (no copy)
    v[0, 0, 0] = 99
    assert x[0, 0, 0] == 99


def test_reverse_ordering_f_c_contiguity():
    x = np.zeros((5, 6, 7), order="C")
    v = array_view_reverse_ordering(x)
    assert x.flags.c_contiguous
    assert v.flags.f_contiguous


def profile_image_ordering(n: int = 256):
    """Informal microbenchmark (not asserted; run as a script).

    Compares summing along the contiguous vs strided axis — the effect the
    reference's __main__-only benchmark demonstrates.
    """
    x = np.random.default_rng(0).standard_normal((n, n, n)).astype(np.float32)
    t0 = time.perf_counter()
    s1 = x.sum(axis=2).sum()
    t_contig = time.perf_counter() - t0
    t0 = time.perf_counter()
    s2 = x.sum(axis=0).sum()
    t_strided = time.perf_counter() - t0
    print(f"contiguous-axis sum: {t_contig*1e3:.1f} ms; strided: {t_strided*1e3:.1f} ms")
    return s1, s2


if __name__ == "__main__":
    profile_image_ordering()
