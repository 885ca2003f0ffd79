"""Classification tests: sklearn bridge and the TPU-native classifier."""

import numpy as np
import pytest

from nd_tpu.classify import (Classifier, JaxClassifier, _build_X,
                             _broadcast_labels, class_mean)
from nd_tpu.core import DataArray
from nd_tpu.testing import create_mock_classes, generate_test_dataset


@pytest.fixture
def mock():
    return create_mock_classes(dims={'y': 30, 'x': 30, 'time': 4})


def test_build_X_shape():
    ds = generate_test_dataset(dims={'y': 10, 'x': 12, 'time': 3})
    X = _build_X(ds)
    assert X.shape == (10 * 12 * 3, 4)
    X2 = _build_X(ds, feature_dims=['time'])
    assert X2.shape == (10 * 12, 4 * 3)


def test_broadcast_labels():
    ds = generate_test_dataset(dims={'y': 10, 'x': 12, 'time': 3})
    labels = DataArray(np.ones((10, 12)), dims=('y', 'x'),
                       coords={'y': ds['y'].values,
                               'x': ds['x'].values})
    b = _broadcast_labels(labels, ds)
    assert set(b.dims) == {'y', 'x', 'time'}


def test_supervised_classification(mock):
    from sklearn.linear_model import LogisticRegression
    ds, labels = mock
    c = Classifier(LogisticRegression(max_iter=200))
    c.fit(ds, labels)
    pred = c.predict(ds)
    assert set(pred.dims) == {'y', 'x', 'time'}
    truth = _broadcast_labels(labels, ds).values
    acc = (np.asarray(pred.values) == truth).mean()
    assert acc > 0.95


def test_predict_proba(mock):
    from sklearn.linear_model import LogisticRegression
    ds, labels = mock
    c = Classifier(LogisticRegression(max_iter=200))
    c.fit(ds, labels)
    proba = c.predict(ds, func='predict_proba')
    assert 'label' in proba.dims
    sums = np.asarray(proba.values).sum(axis=proba.dims.index('label'))
    np.testing.assert_allclose(sums, 1.0, atol=1e-6)


def test_unsupervised_clustering(mock):
    from sklearn.cluster import KMeans
    ds, labels = mock
    c = Classifier(KMeans(n_clusters=2, n_init=5, random_state=0))
    pred = c.fit_predict(ds)
    truth = _broadcast_labels(labels, ds).values
    p = np.asarray(pred.values)
    # clusters must align with classes up to permutation
    acc = max(((p == 0) == (truth == 1)).mean(),
              ((p == 1) == (truth == 1)).mean())
    assert acc > 0.95


def test_nan_handling(mock):
    from sklearn.linear_model import LogisticRegression
    ds, labels = mock
    dsn = ds.copy()
    for v in dsn.data_vars:
        data = dsn[v].values
        data[:3, :3, :] = np.nan
        dsn[v] = (dsn[v].dims, data)
    c = Classifier(LogisticRegression(max_iter=200))
    c.fit(dsn, labels)
    pred = c.predict(dsn)
    assert np.isnan(np.asarray(pred.values)[:3, :3, :]).all()


def test_scaling(mock):
    from sklearn.linear_model import LogisticRegression
    ds, labels = mock
    c = Classifier(LogisticRegression(max_iter=200), scale=True)
    c.fit(ds, labels)
    assert c._scaler is not None
    pred = c.predict(ds)
    truth = _broadcast_labels(labels, ds).values
    assert (np.asarray(pred.values) == truth).mean() > 0.95


def test_score(mock):
    from sklearn.linear_model import LogisticRegression
    ds, labels = mock
    c = Classifier(LogisticRegression(max_iter=200))
    c.fit(ds, labels)
    s = c.score(ds, labels)
    assert s > 0.95


def test_feature_dims(mock):
    from sklearn.linear_model import LogisticRegression
    ds, labels = mock
    c = Classifier(LogisticRegression(max_iter=200),
                   feature_dims=['time'])
    c.fit(ds, labels)
    pred = c.predict(ds)
    assert set(pred.dims) == {'y', 'x'}


def test_class_mean(mock):
    ds, labels = mock
    means = class_mean(ds, labels)
    v = list(ds.data_vars)[0]
    vals = np.asarray(means[v].values)
    m1 = vals[np.asarray(labels.values) == 1]
    assert np.allclose(m1, m1.ravel()[0])


def test_jax_classifier(mock):
    ds, labels = mock
    c = JaxClassifier(epochs=200, lr=0.05)
    pred = c.fit_predict(ds, labels)
    truth = _broadcast_labels(labels, ds).values
    acc = (np.asarray(pred.values) == truth).mean()
    assert acc > 0.95


def test_jax_classifier_proba(mock):
    ds, labels = mock
    c = JaxClassifier(epochs=100, lr=0.05)
    c.fit(ds, labels)
    proba = c.predict(ds, func='predict_proba')
    assert 'label' in proba.dims


def test_jax_classifier_wide_n_classes():
    """Explicit n_classes wider than the observed labels: surplus
    (untrained) output columns must never win predictions."""
    from nd_tpu.classify import JaxClassifier
    from nd_tpu.testing import create_mock_classes
    ds, labels = create_mock_classes()
    c = JaxClassifier(n_classes=5, epochs=20)
    c.fit(ds, labels)
    pred = c.predict(ds)
    vals = np.asarray(pred.values)
    observed = set(np.unique(np.asarray(labels.values)))
    assert set(np.unique(vals[~np.isnan(vals)])).issubset(observed)


def test_jax_classifier_too_many_classes_raises():
    from nd_tpu.classify import JaxClassifier
    from nd_tpu.testing import create_mock_classes
    ds, labels = create_mock_classes()
    with pytest.raises(ValueError):
        JaxClassifier(n_classes=1, epochs=1).fit(ds, labels)


def test_jax_classifier_unknown_func_raises():
    from nd_tpu.classify import JaxClassifier
    from nd_tpu.testing import create_mock_classes
    ds, labels = create_mock_classes()
    c = JaxClassifier(epochs=5)
    c.fit(ds, labels)
    with pytest.raises(AttributeError):
        c.predict(ds, func='predict_probab')
