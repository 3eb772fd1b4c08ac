import numpy as np
import jax.numpy as jnp

from gradient_sdf_tpu.ops import normals, filters

W, H = 64, 48
K = np.array([[60.0, 0, 31.5], [0, 60.0, 23.5], [0, 0, 1]], dtype=np.float32)


def test_box_filter_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    img = rng.rand(20, 30).astype(np.float32)
    for win in (3, 5, 11):
        got = np.asarray(normals.box_filter(jnp.asarray(img), win))
        # brute-force reflect-101 box sum
        r = win // 2
        pad = np.pad(img, r, mode="reflect")
        exp = np.zeros_like(img)
        for i in range(img.shape[0]):
            for j in range(img.shape[1]):
                exp[i, j] = pad[i:i + win, j:j + win].sum()
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)


def test_normals_of_fronto_parallel_plane():
    cache = normals.build_cache(W, H, K, window=5)
    depth = jnp.full((H, W), 1.5, jnp.float32)
    n = np.asarray(normals.compute_normals(cache, depth))
    # plane facing the camera: normal = +-(0,0,1); FALS convention gives
    # the solution of M n = b with b ~ sum(ray)/z > 0 -> n_z > 0 (inward)
    interior = n[5:-5, 5:-5]
    nz = interior[..., 2]
    assert np.all(np.abs(nz) > 0.99)
    assert np.allclose(np.linalg.norm(interior, axis=-1), 1.0, atol=1e-4)


def test_normals_of_sloped_plane():
    """Depth plane z = a + b*x0*z => implicit plane; check against analytic
    normal via cross products of backprojected neighbors."""
    cache = normals.build_cache(W, H, K, window=5)
    # plane in space: z = 1.5 + 0.3 * X  (X = x0 * z)  =>  z(1 - 0.3 x0) = 1.5
    x0 = np.asarray(cache.x0)
    depth = (1.5 / (1.0 - 0.3 * x0)).astype(np.float32)
    n = np.asarray(normals.compute_normals(cache, jnp.asarray(depth)))
    # analytic plane: -0.3*X + Z = 1.5 -> normal prop to (-0.3, 0, 1)
    expect = np.array([-0.3, 0.0, 1.0])
    expect /= np.linalg.norm(expect)
    interior = n[10:-10, 10:-10].reshape(-1, 3)
    cos = np.abs(interior @ expect)
    assert np.median(cos) > 0.999


def test_median_blur_matches_numpy():
    rng = np.random.RandomState(1)
    img = rng.rand(16, 17).astype(np.float32)
    got = np.asarray(filters.median_blur(jnp.asarray(img), 5))
    pad = np.pad(img, 2, mode="reflect")
    exp = np.zeros_like(img)
    for i in range(16):
        for j in range(17):
            exp[i, j] = np.median(pad[i:i + 5, j:j + 5])
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_bilinear_sample_interior_bounds_and_gradient():
    img = jnp.asarray(
        np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    )
    u = jnp.asarray([1.5, 0.0, 2.9, 4.0, -0.1])
    v = jnp.asarray([1.0, 0.0, 1.9, 1.0, 0.0])
    vals, dAdu, dAdv, inb = filters.bilinear_sample_grad(img, u, v)
    vals = np.asarray(vals)[:, 0]
    assert abs(vals[0] - 5.5) < 1e-5   # between (1,1)=5 and (1,2)=6
    assert abs(vals[1]) < 1e-6
    # in-bounds test is 0 <= u < W (reference PhotometricOptimizer.cpp:176-178)
    assert list(np.asarray(inb)) == [True, True, True, False, False]
    # analytic gradient of img(v,u) = 4v + u: dA/du = 1, dA/dv = 4
    np.testing.assert_allclose(np.asarray(dAdu)[:3, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dAdv)[:3, 0], 4.0, atol=1e-5)
