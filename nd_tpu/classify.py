"""Classification and clustering on datacubes.

Parity surface of /root/reference/nd/classify.py — the
``Classifier`` wrapper marshals datacubes into (samples, features)
design matrices for any scikit-learn estimator, with NaN masking, label
broadcasting and optional scaling.

TPU-native addition: :class:`JaxClassifier`, a device-resident
mini-batch trainer (optax) for logistic-regression / MLP heads that can
be sharded over a device mesh via ``nd_tpu.parallel`` (data-parallel
training), so classification of large cubes never leaves the TPU.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

from . import utils
from .core import DataArray, Dataset

try:
    from sklearn import metrics, preprocessing
except ImportError:  # pragma: no cover
    metrics = preprocessing = None

__all__ = ['Classifier', 'JaxClassifier', 'class_mean']


def class_mean(ds, labels):
    """Replace every pixel with the mean of its class.

    Parameters
    ----------
    ds : Dataset
    labels : DataArray
        Class label per pixel; label dims may be a subset of data dims.
    """
    # Deliberate parity with the reference's sequential fillna loop
    # (reference classify.py:15-44): each class's fill step replaces
    # EVERY remaining NaN — including NaN pixels of classes processed
    # later — so earlier classes' means leak into later ones exactly
    # as they do upstream.
    labels_arr = labels
    uniques = np.unique(np.asarray(
        labels.values if isinstance(labels, DataArray) else labels))
    _means = ds.copy()
    for lab in uniques:
        if np.isnan(lab):
            continue
        where = _means.where(labels_arr == lab)
        wherenot = _means.where(labels_arr != lab)
        means = where.mean()
        filled = wherenot
        for v in _means.data_vars:
            fill_val = float(np.asarray(means[v].values))
            filled[v] = (filled[v].dims,
                         np.where(np.isnan(filled[v].values), fill_val,
                                  filled[v].values))
        _means = filled
    return _means


def _get_data_dims(ds, feature_dims=[]):
    return tuple(d for d in ds.coords if d in ds.sizes
                 and d not in feature_dims)


def _get_data_shape(ds, feature_dims=[]):
    data_dims = _get_data_dims(ds, feature_dims=feature_dims)
    return tuple(ds.sizes[d] for d in data_dims)


def _build_X(ds, feature_dims=[]):
    """Stack feature_dims + variables into the feature axis and flatten
    the remaining dims into samples -> (n_samples, n_features)."""
    data_dims = _get_data_dims(ds, feature_dims=feature_dims)
    features = tuple(feature_dims) + ('variable',)

    if isinstance(ds, Dataset):
        variables = utils.get_vars_for_dims(ds, data_dims)
        data = ds[variables].to_array()
    else:
        data = ds.expand_dims('variable')

    # order: data_dims..., then feature dims, flattened
    order = tuple(data_dims) + features
    arr = data.transpose(*[d for d in order if d in data.dims])
    vals = np.asarray(arr.values)
    n_feat = int(np.prod(vals.shape[len(data_dims):]))
    return vals.reshape((-1, n_feat))


def _name_label_axes(shape, ds, data_dims):
    """Pair every axis of a bare label array with a sample dim.

    Axes are matched left to right against the first not-yet-claimed
    sample dim of the same length, turning an anonymous ndarray into a
    named-dim view that the DataArray broadcast path can handle.
    """
    unclaimed = list(data_dims)
    named = []
    for length in shape:
        dim = next((d for d in unclaimed if ds.sizes[d] == length), None)
        if dim is None:
            raise ValueError(
                'label array of shape {!r} does not align with sample '
                'dims {!r}'.format(shape, tuple(data_dims)))
        named.append(dim)
        unclaimed.remove(dim)
    return tuple(named)


def _broadcast_labels(labels, ds, feature_dims=[]):
    """Broadcast labels over every sample dim of ``ds`` (named-dim
    alignment; capability parity with the reference's label broadcast)."""
    data_dims = _get_data_dims(ds, feature_dims=feature_dims)
    bare = isinstance(labels, np.ndarray)
    if bare:
        dims = _name_label_axes(labels.shape, ds, data_dims)
        labels = DataArray(labels, dims=dims)
    if not isinstance(labels, DataArray):
        raise TypeError(type(labels))

    # lay the label axes out in sample order, leave singleton slots for
    # the dims the labels don't carry, then stretch those slots
    present = [d for d in data_dims if d in labels.dims]
    body = np.asarray(labels.transpose(*present).values)
    slotted = body.reshape(tuple(
        ds.sizes[d] if d in present else 1 for d in data_dims))
    full = np.broadcast_to(
        slotted, tuple(ds.sizes[d] for d in data_dims))
    if bare:
        return full
    coords = OrderedDict(
        (d, np.asarray(ds.coords[d].values))
        for d in data_dims if d in ds.coords)
    return DataArray(full, dims=data_dims, coords=coords)


class Classifier:
    """Bridge between datacubes and scikit-learn estimators.

    Parameters
    ----------
    clf : sklearn estimator
        Must provide ``fit`` and ``predict``.
    feature_dims : list, optional
        Extra dimensions treated as features rather than samples (e.g.
        ``['time']`` to make every time step an independent feature).
    scale : bool, optional
        Standardize features before fitting (default: False).
    """

    def __init__(self, clf, feature_dims=[], scale=False):
        self.clf = clf
        self.feature_dims = feature_dims
        self.scale = scale
        self._scaler = None

    def make_Xy(self, ds, labels=None):
        """Build scikit-learn compatible (X, y) with NaN/0 masking."""
        if isinstance(labels, Dataset):
            raise ValueError('`labels` should be a DataArray or numpy '
                             'array of the same dimensions as the '
                             'dataset.')
        if isinstance(labels, (DataArray, np.ndarray)):
            labels = labels.squeeze()

        if labels is not None:
            labels = _broadcast_labels(labels, ds,
                                       feature_dims=self.feature_dims)
            labels_np = np.asarray(
                labels.values if isinstance(labels, DataArray)
                else labels).astype(np.float64)
            # valid samples carry a positive finite class id; NaN and
            # the 0 "unlabelled" sentinel both fail the comparison
            ymask = (labels_np > 0).reshape(-1)
        else:
            ymask = slice(None)
            labels_np = None

        X = _build_X(ds, feature_dims=self.feature_dims)[ymask]
        Xmask = ~np.isnan(X).any(axis=1)
        X = X[Xmask]

        y = None
        if labels_np is not None:
            y = labels_np.reshape(-1)[ymask][Xmask]

        if self.scale:
            if preprocessing is None:
                raise ImportError(
                    'scale=True requires scikit-learn')
            self._scaler = preprocessing.StandardScaler()
            self._scaler.fit(X)
            X = self._scaler.transform(X)
        return (X, y)

    def fit(self, ds, labels=None):
        """Train the wrapped estimator on the datacube."""
        X, y = self.make_Xy(ds, labels=labels)
        self.clf.fit(X, y)
        return self

    def predict(self, ds, func='predict'):
        """Predict labels (or probabilities with func='predict_proba');
        NaN rows stay NaN, output is reshaped to the data dims."""
        if func not in dir(self.clf):
            raise AttributeError('Classifier has no method {}.'
                                 .format(func))
        X = _build_X(ds, feature_dims=self.feature_dims)
        mask = ~np.isnan(X).any(axis=1)
        Xv = X[mask]
        if self.scale:
            Xv = self._scaler.transform(Xv)
        result = getattr(self.clf, func)(Xv)
        result = np.asarray(result)

        data_dims = _get_data_dims(ds, feature_dims=self.feature_dims)
        data_shape = _get_data_shape(ds, feature_dims=self.feature_dims)
        data_coords = OrderedDict(
            (dim, np.asarray(ds.coords[dim].values))
            for dim in data_dims if dim in ds.coords)

        labels_flat = np.full(mask.shape + result.shape[1:], np.nan)
        labels_flat[mask] = result
        labels_data = labels_flat.reshape(data_shape + result.shape[1:])
        if len(result.shape) > 1:
            data_dims = data_dims + ('label',)
            data_coords['label'] = np.arange(result.shape[1])

        return DataArray(labels_data, dims=data_dims,
                         coords=data_coords)

    def fit_predict(self, ds, labels=None):
        self.fit(ds, labels)
        return self.predict(ds)

    def score(self, ds, labels=None, method='accuracy'):
        """Classification score using a scikit-learn scorer by name."""
        if metrics is None:
            raise ImportError('score() requires scikit-learn')
        try:
            scorer = metrics.get_scorer(method)
        except Exception:
            raise ValueError("'{}' is not a valid scoring method"
                             .format(method))
        X, y = self.make_Xy(ds, labels=labels)
        return scorer(self.clf, X, y)


# ---------------------------------------------------------------------------
# TPU-native classifier
# ---------------------------------------------------------------------------

class JaxClassifier:
    """Device-resident classifier trained with optax (new capability
    beyond the reference: the whole fit/predict path runs on TPU and
    shards over a mesh for large cubes).

    Parameters
    ----------
    hidden : tuple of int, optional
        Hidden layer widths; empty tuple = multinomial logistic
        regression (default: ()).
    n_classes : int, optional
        Number of classes (default: inferred from labels in fit()).
    epochs : int, optional
        Training epochs over the full design matrix (default: 100).
    lr : float, optional
        Adam learning rate (default: 1e-2).
    seed : int, optional
        PRNG seed (default: 0).
    feature_dims : list, optional
        Same semantics as :class:`Classifier`.
    """

    def __init__(self, hidden=(), n_classes=None, epochs=100, lr=1e-2,
                 seed=0, feature_dims=[]):
        self.hidden = tuple(hidden)
        self.n_classes = n_classes
        self.epochs = epochs
        self.lr = lr
        self.seed = seed
        self.feature_dims = feature_dims
        self.params = None
        self._classes = None

    # -- model ------------------------------------------------------------
    def _init_params(self, n_features, n_classes):
        import jax
        import jax.numpy as jnp
        key = jax.random.PRNGKey(self.seed)
        sizes = (n_features,) + self.hidden + (n_classes,)
        params = []
        for i in range(len(sizes) - 1):
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, (sizes[i], sizes[i + 1]),
                                  jnp.float32) \
                * np.sqrt(2.0 / sizes[i])
            b = jnp.zeros((sizes[i + 1],), jnp.float32)
            params.append((w, b))
        return params

    @staticmethod
    def _forward(params, X):
        import jax
        import jax.numpy as jnp
        h = X
        for i, (w, b) in enumerate(params):
            h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            if i < len(params) - 1:
                h = jax.nn.relu(h)
        return h

    def loss_fn(self, params, X, y):
        import jax.numpy as jnp
        import jax
        logits = self._forward(params, X)
        logp = jax.nn.log_softmax(logits)
        # one-hot masked reduction instead of take_along_axis: XLA
        # lowers per-row gathers serially on TPU (see CLAUDE.md)
        onehot = jax.nn.one_hot(y.astype(jnp.int32), logp.shape[-1],
                                dtype=logp.dtype)
        return -jnp.mean(jnp.sum(onehot * logp, axis=-1))

    def train_step(self, params, opt_state, X, y, optimizer):
        """One jittable optimizer step (used by the multi-chip dryrun)."""
        import jax
        loss, grads = jax.value_and_grad(self.loss_fn)(params, X, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # -- API --------------------------------------------------------------
    def fit(self, ds, labels):
        import jax
        import jax.numpy as jnp
        import optax

        helper = Classifier(clf=None, feature_dims=self.feature_dims)
        X, y = helper.make_Xy(ds, labels)
        self._classes, y_idx = np.unique(y, return_inverse=True)
        if self.n_classes and len(self._classes) > self.n_classes:
            raise ValueError(
                'labels contain %d distinct classes but n_classes=%d'
                % (len(self._classes), self.n_classes))
        n_classes = self.n_classes or len(self._classes)

        Xd = jnp.asarray(X, jnp.float32)
        yd = jnp.asarray(y_idx, jnp.int32)
        self._mu = jnp.mean(Xd, axis=0)
        self._sd = jnp.std(Xd, axis=0) + 1e-8
        Xd = (Xd - self._mu) / self._sd

        params = self._init_params(X.shape[1], n_classes)
        optimizer = optax.adam(self.lr)
        opt_state = optimizer.init(params)

        @jax.jit
        def step(params, opt_state):
            return self.train_step(params, opt_state, Xd, yd, optimizer)

        for _ in range(self.epochs):
            params, opt_state, loss = step(params, opt_state)
        self.params = params
        return self

    def predict(self, ds, func='predict'):
        import jax.numpy as jnp
        if self.params is None:
            raise RuntimeError('fit() must be called before predict()')
        X = _build_X(ds, feature_dims=self.feature_dims)
        mask = ~np.isnan(X).any(axis=1)
        Xd = (jnp.asarray(X[mask], jnp.float32) - self._mu) / self._sd
        if func not in ('predict', 'predict_proba'):
            raise AttributeError('unknown prediction func %r' % func)
        logits = self._forward(self.params, Xd)
        if func == 'predict_proba':
            import jax
            result = np.asarray(jax.nn.softmax(logits))
        else:
            # argmax only over the classes observed in fit(): with an
            # explicit wider n_classes the surplus columns are
            # untrained and must never win
            idx = np.asarray(jnp.argmax(
                logits[:, :len(self._classes)], axis=1))
            result = self._classes[idx]

        data_dims = _get_data_dims(ds, feature_dims=self.feature_dims)
        data_shape = _get_data_shape(ds, feature_dims=self.feature_dims)
        data_coords = OrderedDict(
            (dim, np.asarray(ds.coords[dim].values))
            for dim in data_dims if dim in ds.coords)
        flat = np.full(mask.shape + result.shape[1:], np.nan)
        flat[mask] = result
        data = flat.reshape(data_shape + result.shape[1:])
        if result.ndim > 1:
            data_dims = data_dims + ('label',)
            data_coords['label'] = np.arange(result.shape[1])
        return DataArray(data, dims=data_dims, coords=data_coords)

    def fit_predict(self, ds, labels):
        self.fit(ds, labels)
        return self.predict(ds)
