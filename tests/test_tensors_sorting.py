"""core/tensors + core/sorting parity surfaces (SURVEY.md §2.5, §2.8)."""
import jax.numpy as jnp
import numpy as np

from reak_tpu.math import tensors as tn
from reak_tpu.math import sorting as srt


def test_tensor3_contractions(rng):
    T = jnp.asarray(rng.standard_normal((4, 3, 5)))
    v = jnp.asarray(rng.standard_normal(5))
    M = jnp.asarray(rng.standard_normal((5, 2)))
    np.testing.assert_allclose(np.asarray(tn.tensor3_vec(T, v)),
                               np.einsum("ijk,k->ij", T, v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(tn.tensor3_mat(T, M)),
                               np.einsum("ijk,kl->ijl", T, M), atol=1e-12)
    u = jnp.asarray(rng.standard_normal(4))
    np.testing.assert_allclose(np.asarray(tn.vec_tensor3(u, T)),
                               np.einsum("i,ijk->jk", u, T), atol=1e-12)


def test_tensor4_and_outer(rng):
    T4 = jnp.asarray(rng.standard_normal((2, 3, 4, 5)))
    M = jnp.asarray(rng.standard_normal((4, 5)))
    np.testing.assert_allclose(np.asarray(tn.tensor4_mat(T4, M)),
                               np.einsum("ijkl,kl->ij", T4, M), atol=1e-12)
    a, b, c = (jnp.asarray(rng.standard_normal(3)) for _ in range(3))
    O = tn.outer3(a, b, c)
    np.testing.assert_allclose(float(O[0, 1, 2]),
                               float(a[0] * b[1] * c[2]), atol=1e-14)
    S = tn.sym_part3(O)
    np.testing.assert_allclose(np.asarray(S), np.asarray(
        jnp.swapaxes(S, -1, -2)), atol=1e-14)


def test_sorting_batched(rng):
    x = jnp.asarray(rng.standard_normal((8, 20)))
    s = srt.sort(x)
    assert bool(jnp.all(jnp.diff(s, axis=-1) >= 0))
    r = srt.rank(x)
    # the element with rank 0 is the row minimum
    mins = jnp.take_along_axis(x, jnp.argsort(r, axis=-1)[:, :1], axis=-1)
    np.testing.assert_allclose(np.asarray(mins[:, 0]),
                               np.asarray(jnp.min(x, axis=-1)), atol=0)


def test_smallest_k_matches_sort(rng):
    x = jnp.asarray(rng.standard_normal(50))
    v, i = srt.smallest_k(x, 5)
    np.testing.assert_allclose(np.sort(np.asarray(v)),
                               np.sort(np.asarray(x))[:5], atol=0)


def test_median_partition(rng):
    x = jnp.asarray(rng.standard_normal(31))
    med, below = srt.median_partition(x)
    assert abs(int(below.sum()) - 16) <= 1


def test_lexsort_2key():
    p = jnp.asarray([2.0, 1.0, 2.0, 1.0])
    s = jnp.asarray([0.5, 9.0, 0.1, 1.0])
    order = srt.lexsort_2key(p, s)
    got = [(float(p[i]), float(s[i])) for i in np.asarray(order)]
    assert got == sorted(got)
