"""SSL evaluation protocols: k-NN classification and linear probing on
frozen backbone features.

Behavioral spec: dinov2/dinov2/eval/knn.py:99-184 (KnnModule: L2-normalized
cosine similarity, top-k neighbours, softmax(sims/T) weighted one-hot vote,
per-k accuracies) and dinov2/dinov2/eval/linear.py (linear classifiers on
frozen [cls] features trained with SGD+cosine; log_regression.py is the
same objective solved with L-BFGS — here one jitted Adam/softmax-CE
trainer covers both protocols).

TPU-native: the reference's rank-chunked broadcast/gather pipeline
(knn.py:129-169) is replaced by ONE jnp similarity matmul — under a dp
mesh with the train-feature axis sharded, the SPMD partitioner inserts the
same all-to-all traffic the reference hand-rolls."""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def extract_cls_features(backbone, params, images, batch_size: int = 64):
    """Frozen-backbone [cls] features, L2-normalized (eval/utils.py
    ModelWithNormalize semantics). images: (N, H, W, 3) f32."""
    f = jax.jit(
        lambda x: backbone.apply({"params": params}, x)["x_norm_clstoken"]
    )
    outs = []
    for i in range(0, images.shape[0], batch_size):
        outs.append(f(jnp.asarray(images[i : i + batch_size])))
    feats = jnp.concatenate(outs, 0)
    return feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)


def knn_classify(
    train_feats, train_labels, test_feats,
    nb_knn: Sequence[int] = (10, 20, 100, 200),
    T: float = 0.07,
    num_classes: int | None = None,
) -> Dict[int, jnp.ndarray]:
    """{k: (N_test, num_classes) class probabilities} for each k in nb_knn
    (knn.py:170-184). Features must be L2-normalized."""
    num_classes = num_classes or int(jnp.max(train_labels)) + 1
    max_k = max(nb_knn)
    sims = test_feats @ train_feats.T  # cosine similarity
    topk_sims, idx = jax.lax.top_k(sims, max_k)
    neighbor_labels = train_labels[idx]  # (N, max_k)
    w = jax.nn.softmax(topk_sims / T, axis=-1)[..., None]
    votes = jax.nn.one_hot(neighbor_labels, num_classes) * w  # (N, max_k, C)
    return {k: jnp.sum(votes[:, :k, :], axis=1) for k in nb_knn}


def knn_accuracy(train_feats, train_labels, test_feats, test_labels,
                 nb_knn: Sequence[int] = (10, 20, 100, 200), T: float = 0.07,
                 num_classes: int | None = None) -> Dict[int, float]:
    probas = knn_classify(train_feats, train_labels, test_feats, nb_knn, T, num_classes)
    return {
        k: float(jnp.mean(jnp.argmax(p, -1) == test_labels))
        for k, p in probas.items()
    }


def train_linear_probe(
    train_feats, train_labels, num_classes: int | None = None,
    lr: float = 1e-2, weight_decay: float = 0.0, steps: int = 500,
    batch_size: int = 256, seed: int = 0,
):
    """Multinomial logistic regression on frozen features (linear.py's
    LinearClassifier objective; with weight_decay=0 it is also
    log_regression.py's). Returns (W, b)."""
    import optax

    num_classes = num_classes or int(jnp.max(train_labels)) + 1
    D = train_feats.shape[-1]
    params = {
        "w": jnp.zeros((D, num_classes), jnp.float32),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt = tx.init(params)
    N = train_feats.shape[0]

    def step(carry, rng):
        params, opt = carry
        idx = jax.random.randint(rng, (min(batch_size, N),), 0, N)

        def loss_fn(p):
            logits = train_feats[idx] @ p["w"] + p["b"]
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits, train_labels[idx]
                )
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), opt), loss

    rngs = jax.random.split(jax.random.PRNGKey(seed), steps)
    (params, _), losses = jax.lax.scan(step, (params, opt), rngs)
    return params, np.asarray(losses)


def linear_probe_accuracy(params, feats, labels) -> float:
    logits = feats @ params["w"] + params["b"]
    return float(jnp.mean(jnp.argmax(logits, -1) == labels))


def log_regression_accuracy(
    train_feats, train_labels, val_feats, val_labels,
    test_feats=None, test_labels=None,
    l2_values: Sequence[float] = tuple(10.0**e for e in range(-4, 3)),
    steps: int = 400, lr: float = 0.5, num_classes: int | None = None,
):
    """The log-regression eval protocol (dinov2/eval/log_regression.py:
    full-batch L2-regularized multinomial logistic regression, sweeping the
    regularization strength on a validation split and reporting the best
    classifier's test accuracy).

    The reference solves each sweep point with cuML's GPU L-BFGS; here each
    is one jitted full-batch gradient-descent-with-momentum solve (convex
    objective — any converged solver lands on the same optimum). Returns
    (best_test_acc, best_l2, {l2: val_acc}).
    """
    import optax

    num_classes = num_classes or int(jnp.max(train_labels)) + 1
    D = train_feats.shape[-1]
    if test_feats is None:
        test_feats, test_labels = val_feats, val_labels

    @jax.jit
    def solve(l2):
        params = {
            "w": jnp.zeros((D, num_classes), jnp.float32),
            "b": jnp.zeros((num_classes,), jnp.float32),
        }
        tx = optax.sgd(lr, momentum=0.9)
        opt = tx.init(params)

        def loss_fn(p):
            logits = train_feats @ p["w"] + p["b"]
            ce = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, train_labels)
            )
            return ce + l2 * jnp.sum(p["w"] ** 2)

        def step(carry, _):
            params, opt = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            return (optax.apply_updates(params, updates), opt), loss

        (params, _), _ = jax.lax.scan(step, (params, opt), None, length=steps)
        return params

    val_accs = {}
    best_l2, best_params, best_val = None, None, -1.0
    for l2 in l2_values:
        params = solve(jnp.asarray(l2, jnp.float32))
        acc = linear_probe_accuracy(params, val_feats, val_labels)
        val_accs[l2] = acc
        if acc > best_val:
            best_val, best_l2, best_params = acc, l2, params
    test_acc = linear_probe_accuracy(best_params, test_feats, test_labels)
    return test_acc, best_l2, val_accs
