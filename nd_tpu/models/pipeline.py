"""Flagship end-to-end pipelines.

``SARChangePipeline`` is the framework's flagship model: the full SAR
processing chain (multilook -> Wishart omnibus change statistics ->
feature extraction -> classifier head) expressed as a single jittable
program that shards over a device mesh:

  - the multilook convolution runs under ``shard_map`` with explicit
    ICI halo exchange (nd_tpu.parallel.halo),
  - the per-pixel change statistics and the classifier loss are
    data-parallel over the (y, x) mesh axes; XLA inserts the gradient
    reductions.

This is the program benchmarked by ``bench.py`` and compile-checked by
``__graft_entry__`` (single-chip forward + N-device training step).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.change import change_detection, omnibus_probabilities
from ..ops.conv import convolve

__all__ = ['SARChangePipeline', 'multilook', 'change_features']


def multilook(values, w=3):
    """Boxcar multilook of a (y, x, time, 4) covariance stack."""
    kernel = jnp.ones((w, w), values.dtype) / (w * w)
    return convolve(values, kernel, axes=(0, 1), mode='reflect')


def change_features(values, n=1):
    """Per-pixel features from a (y, x, time, 4) covariance stack.

    Returns (y, x, F): temporal mean/std of the diagonal channels, the
    mean cross-channel coherence, and the omnibus probability of the
    full series.
    """
    c11 = values[..., 0]
    c22 = values[..., 3]
    eps = jnp.asarray(1e-12, values.dtype)
    ratio = c11 / (c22 + eps)
    coh = jnp.sqrt(values[..., 1] ** 2 + values[..., 2] ** 2) \
        / (jnp.sqrt(jnp.abs(c11 * c22)) + eps)
    prob = omnibus_probabilities(values, n=n)
    feats = [c11.mean(-1), c11.std(-1), c22.mean(-1), c22.std(-1),
             ratio.mean(-1), coh.mean(-1),
             jnp.nan_to_num(prob, nan=0.0)]
    return jnp.stack(feats, axis=-1)


class SARChangePipeline:
    """Multilook + omnibus change detection + classifier head.

    Parameters
    ----------
    ml : int, optional
        Multilook window (default 3).
    n : int, optional
        Looks already present in the input (default 1; the multilook
        multiplies this by ml**2).
    alpha : float, optional
        Change threshold (default 0.9).
    n_classes : int, optional
        Classifier classes (default 2).
    lr : float, optional
        SGD learning rate for the classifier head (default 0.05).
    """

    N_FEATURES = 7

    def __init__(self, ml=3, n=1, alpha=0.9, n_classes=2, lr=0.05):
        self.ml = ml
        self.n = n
        self.alpha = alpha
        self.n_classes = n_classes
        self.lr = lr

    # -- initialization ------------------------------------------------------
    def init_params(self, seed=0):
        key = jax.random.PRNGKey(seed)
        w = jax.random.normal(
            key, (self.N_FEATURES, self.n_classes), jnp.float32) * 0.1
        b = jnp.zeros((self.n_classes,), jnp.float32)
        return {'w': w, 'b': b}

    # -- forward (inference) -------------------------------------------------
    def forward(self, values):
        """values (y, x, time, 4) -> boolean change map (y, x, time).

        The jittable single-chip forward step (graft entry). On TPU the
        change scan runs as the fused Pallas kernel with on-device
        float64 re-scan of near-margin pixels; should the suspect
        count ever overflow the patch capacity, a jit-safe
        ``lax.cond`` recomputes the full grid with the unrolled
        'mixed' scan — decisions are exact either way. Elsewhere (or
        with jax x64 disabled, where a device f64 rescan cannot
        exist) it falls back to the XLA 'mixed' path."""
        looked = multilook(values, self.ml)
        n = self.n * self.ml ** 2
        from ..ops.change_pallas import _K_MAX, supports_pallas_rescan
        if supports_pallas_rescan(looked.shape[2]) \
                and jax.config.jax_enable_x64:
            from ..ops.change import (_change_detection_exact_core,
                                      _patch_capacity)
            from ..ops.pallas_guard import run_with_fallback
            ny, nx = looked.shape[:2]
            k = looked.shape[2]
            cap = _patch_capacity(ny, nx)

            def _exact(lk):
                flags, count = _change_detection_exact_core(
                    lk, float(self.alpha), int(n), 3e-4, cap)
                # the overflow branch compiles at trace time, so the
                # unrolled (O(k^2)-graph) variant is reserved for
                # short series; long ones fall back to the while_loop
                return jax.lax.cond(
                    count > cap,
                    lambda: change_detection(lk, alpha=self.alpha,
                                             n=n,
                                             unroll=(k <= _K_MAX)),
                    lambda: flags)

            # every eager Pallas dispatch site routes through the
            # shared guard: a transient launch failure retries, then
            # degrades to the numerically-identical mixed XLA scan,
            # and strikes feed the session circuit breaker (under
            # tracing the guard dispatches the primary directly)
            return run_with_fallback(
                _exact,
                lambda lk: change_detection(lk, alpha=self.alpha,
                                            n=n, stat_dtype='mixed'),
                looked)
        return change_detection(looked, alpha=self.alpha, n=n)

    # -- training ---------------------------------------------------------------
    def loss(self, params, values, labels):
        """Masked cross-entropy of the classifier head over change
        features; ``values`` are already multilooked."""
        feats = change_features(values, n=self.n * self.ml ** 2)
        logits = jnp.dot(feats, params['w'],
                         preferred_element_type=jnp.float32) \
            + params['b']
        logp = jax.nn.log_softmax(logits)
        onehot = jax.nn.one_hot(labels, self.n_classes,
                                dtype=logits.dtype)
        mask = (labels >= 0).astype(logits.dtype)
        ll = jnp.sum(logp * onehot, axis=-1) * mask
        return -jnp.sum(ll) / jnp.maximum(jnp.sum(mask), 1.0)

    def train_step(self, params, values, labels, mesh=None):
        """One full training step: sharded multilook (halo exchange over
        the mesh) + data-parallel loss/gradients + SGD update.

        When ``mesh`` is None the step runs single-device.
        """
        if mesh is not None:
            looked = self._sharded_multilook(values, mesh)
        else:
            looked = multilook(values, self.ml)
        loss, grads = jax.value_and_grad(self.loss)(params, looked,
                                                    labels)
        params = jax.tree_util.tree_map(
            lambda p, g: p - self.lr * g, params, grads)
        return params, loss

    def _sharded_multilook(self, values, mesh):
        """Multilook with halos over ICI — delegates to the shared
        `parallel.halo.shard_apply` engine (which also handles pixel
        grids that don't divide the mesh). The shard kernel IS
        :func:`multilook` — one definition for the single-device and
        sharded paths, so they cannot silently diverge."""
        from ..parallel.halo import shard_apply
        halo = self.ml // 2
        return shard_apply(
            lambda x: multilook(x, self.ml),
            values, mesh, {'y': (0, halo), 'x': (1, halo)},
            mode='symmetric')

    # -- full sharded step, jitted over the mesh ---------------------------------
    def make_sharded_step(self, mesh, shape=None):
        """A jitted training step with mesh-sharded inputs.

        Inputs: values P(y, x, None, None), labels P(y, x); parameters
        replicated. XLA partitions the feature/loss computation over the
        pixel grid and all-reduces the gradients over ICI.

        ``shape`` (ny, nx), when given, shrinks each mesh axis to the
        largest count that DIVIDES the pixel grid — jit in_shardings
        require divisibility, so without the fit a 17x19 grid on a
        2x4 mesh was rejected outright (the eager ``train_step(mesh=)``
        path pads instead).
        """
        if shape is not None:
            def fit(n, size):
                n = min(int(n), max(int(size), 1))
                while n > 1 and size % n:
                    n -= 1
                return n
            ny_n = fit(mesh.shape['y'], shape[0])
            nx_n = fit(mesh.shape['x'], shape[1])
            if (ny_n, nx_n) != (mesh.shape['y'], mesh.shape['x']):
                devices = np.asarray(mesh.devices).reshape(-1)
                mesh = jax.sharding.Mesh(
                    devices[:ny_n * nx_n].reshape(ny_n, nx_n),
                    ('y', 'x'))
        data_sharding = NamedSharding(mesh, P('y', 'x', None, None))
        label_sharding = NamedSharding(mesh, P('y', 'x'))
        replicated = NamedSharding(mesh, P())

        step = partial(self.train_step, mesh=mesh)
        return jax.jit(
            step,
            in_shardings=(replicated, data_sharding, label_sharding),
        ), data_sharding, label_sharding
