"""Encoder + classifier tests, including parity spot checks against sklearn/scipy."""

import numpy as np
import pytest


def test_pca_matches_sklearn(rng):
    from sklearn.decomposition import PCA

    from fast_eng_super_resolution_tpu.sched.encoders import PCAEncoder

    feats = [dict(x=rng.normal(size=(50 + i, 4)).astype(np.float32)) for i in range(10)]
    enc = PCAEncoder(n_components=3)
    enc.train(feats)
    ours = enc.get_latent_space(feats)

    min_len = min(f["x"].shape[0] for f in feats)
    mat = np.stack([f["x"][:min_len].reshape(-1) for f in feats])
    ref = PCA(n_components=3).fit_transform(mat)
    # components match up to sign
    for j in range(3):
        a, b = ours[:, j], ref[:, j]
        assert min(np.abs(a - b).max(), np.abs(a + b).max()) < 1e-3


def test_pca_persistence_roundtrip(tmp_path, rng):
    from fast_eng_super_resolution_tpu.sched.encoders import PCAEncoder

    feats = [dict(x=rng.normal(size=(40, 4)).astype(np.float32)) for _ in range(6)]
    enc = PCAEncoder(n_components=2)
    enc.train(feats, save_model=True, path=str(tmp_path))
    assert (tmp_path / "pca_encoder.joblib").exists()  # reference file name
    enc2 = PCAEncoder(n_components=2)
    enc2.load_model(str(tmp_path))
    np.testing.assert_allclose(enc2.get_latent_space(feats), enc.get_latent_space(feats))


def test_wasserstein_matrix_matches_scipy(rng):
    from scipy.stats import wasserstein_distance

    from fast_eng_super_resolution_tpu.sched.classifiers import wasserstein_1d_matrix

    x = rng.normal(size=(5, 20))
    c = rng.normal(size=(3, 20))
    got = wasserstein_1d_matrix(x, c)
    for i in range(5):
        for j in range(3):
            np.testing.assert_allclose(got[i, j], wasserstein_distance(x[i], c[j]),
                                       rtol=1e-10)


def _blobs(rng, k=3, n=60, d=4, spread=0.15):
    centers = rng.normal(size=(k, d)) * 3
    labels = np.repeat(np.arange(k), n // k)
    x = centers[labels] + spread * rng.normal(size=(n, d))
    return x, labels


def _clustering_accuracy(pred, truth, k):
    # best label permutation accuracy
    from itertools import permutations

    best = 0.0
    for perm in permutations(range(k)):
        mapped = np.array([perm[p] for p in pred])
        best = max(best, np.mean(mapped == truth))
    return best


@pytest.mark.parametrize("name", ["kmeans", "gmm", "mean_shift"])
def test_classifiers_recover_blobs(rng, name):
    from fast_eng_super_resolution_tpu.sched.classifiers import init_classifier

    x, truth = _blobs(rng)
    clf = init_classifier(name, n_clusters=3)
    clf.train(x)
    pred = clf.cluster(x)
    if name == "mean_shift":
        assert clf.n_clusters >= 1  # auto cluster count
        if clf.n_clusters != 3:
            pytest.skip(f"mean shift found {clf.n_clusters} clusters")
    acc = _clustering_accuracy(pred, truth, 3)
    assert acc > 0.95, (name, acc)


def test_wasserstein_kmeans_algorithm_fidelity(rng):
    """Checks the KMeansWasserstein algorithm shape (classifier.py:131-220):
    W1 assignment = argmin of the sorted-sample distance, coordinate-mean
    center update, consistent fit/predict.  (Clustering *quality* under this
    metric is data-dependent: the mean update shrinks center spread, a
    property inherited from the reference — W1 separates by value
    distribution, and the coordinate-mean centers wash that out for
    high-dimensional noise.  We assert fidelity, not quality.)"""
    from fast_eng_super_resolution_tpu.sched.classifiers import (
        WassersteinKMeansClassifier, wasserstein_1d_matrix)

    x = np.concatenate([s + 0.1 * rng.normal(size=(20, 8)) for s in (0.0, 5.0)])
    truth = np.repeat(np.arange(2), 20)
    clf = WassersteinKMeansClassifier(n_clusters=2)
    clf.train(x)
    pred = clf.cluster(x)
    # predict is argmin of W1 to the learned centers on scaled data
    xs = clf.scaler.transform(x)
    np.testing.assert_array_equal(pred, np.argmin(
        wasserstein_1d_matrix(xs, clf.centers_), axis=1))
    # offset clusters shift the whole sorted-value profile -> separable
    assert _clustering_accuracy(pred, truth, 2) > 0.95


def test_classifier_persistence(tmp_path, rng):
    from fast_eng_super_resolution_tpu.sched.classifiers import KMeansClassifier

    x, _ = _blobs(rng)
    clf = KMeansClassifier(n_clusters=3)
    clf.train(x, save_model=True, path=str(tmp_path))
    assert (tmp_path / "kmeans_classifier.joblib").exists()
    assert (tmp_path / "kmeans_scaler.joblib").exists()
    clf2 = KMeansClassifier(n_clusters=3)
    clf2.load_model(str(tmp_path))
    np.testing.assert_array_equal(clf2.cluster(x), clf.cluster(x))


def test_spectrum_encoder_3d(rng):
    from fast_eng_super_resolution_tpu.data.synthetic import duct_field, make_duct_mesh
    from fast_eng_super_resolution_tpu.sched.encoders import SpectrumEncoder

    mesh = make_duct_mesh(8, 5, 5)
    v, p = duct_field(mesh.points)
    data = [dict(pos=mesh.points, y=np.concatenate([v, p], 1)) for _ in range(3)]
    enc = SpectrumEncoder(n_components=2, grid_resolution=(8, 8, 8))
    lat = enc.get_latent_space(data)
    assert lat.shape[0] == 3 and np.isfinite(lat).all()
    assert lat.min() >= 0 and lat.max() <= 1  # normalized spectrum


def test_vae_encoder_trains(rng):
    from fast_eng_super_resolution_tpu.sched.encoders import VAEEncoder

    feats = [dict(x=rng.normal(size=(30, 4)).astype(np.float32)) for _ in range(4)]
    enc = VAEEncoder(n_components=2, input_dim=4, hidden_dim=16, num_layers=2,
                     epochs=2)
    enc.train(feats)
    lat = enc.get_latent_space(feats)
    assert lat.shape == (4, 2) and np.isfinite(lat).all()


def test_kmeans_duplicate_latents_no_crash(rng):
    """k-means++ with fewer distinct points than clusters must not raise
    (advisor finding: zero D^2 mass -> searchsorted out of range)."""
    import numpy as np

    from fast_eng_super_resolution_tpu.sched.classifiers import KMeansClassifier

    x = np.tile(rng.normal(size=(2, 3)), (5, 1))  # 10 points, 2 distinct
    clf = KMeansClassifier(n_clusters=4, random_state=0)
    clf.train(x, save_model=False)
    labels = clf.cluster(x)
    assert labels.shape == (10,)
    assert (labels >= 0).all() and (labels < 4).all()


def test_pca_latent_batch_independent():
    """A subdomain's latent must not depend on which other subdomains share
    the transform batch: the old global batch-min truncation changed a
    big subdomain's latent (and potentially its expert) whenever a smaller
    one was in the same request (review finding)."""
    from fast_eng_super_resolution_tpu.sched.encoders import PCAEncoder

    rng = np.random.default_rng(0)
    big1 = {"x": rng.normal(size=(300, 4)).astype(np.float32)}
    big2 = {"x": rng.normal(size=(300, 4)).astype(np.float32)}
    small = {"x": rng.normal(size=(100, 4)).astype(np.float32)}
    enc = PCAEncoder(n_components=2)
    enc.train([big1, big2, {"x": rng.normal(size=(280, 4)).astype(np.float32)}])
    a = enc.get_latent_space([big1, big2])[0]
    b = enc.get_latent_space([big1, small])[0]
    np.testing.assert_allclose(a, b, rtol=1e-6)
