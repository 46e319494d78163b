"""Vocabulary (BoW) tests: descent consistency + grouping + scoring."""

import numpy as np
import jax.numpy as jnp

from monoorbslam3_tpu.ops.vocab import Vocabulary

RNG = np.random.default_rng(31)


def _clustered_descs(n_clusters=40, per_cluster=30, flip=6):
    centers = RNG.integers(0, 2**32, (n_clusters, 8), dtype=np.uint32)
    out, labels = [], []
    for i, c in enumerate(centers):
        for _ in range(per_cluster):
            d = c.copy()
            for _ in range(flip):
                w = RNG.integers(0, 8)
                d[w] ^= np.uint32(1) << np.uint32(RNG.integers(0, 32))
            out.append(d)
            labels.append(i)
    return np.stack(out), np.asarray(labels), centers


def test_transform_groups_similar_descriptors():
    descs, labels, centers = _clustered_descs()
    vocab = Vocabulary.train(descs, k=8, levels=2, group_level=1, seed=0)

    w, g, bow = vocab.transform(jnp.asarray(descs), jnp.ones(len(descs), bool))
    w = np.asarray(w)
    # same-cluster descriptors should mostly share a word
    agree = 0
    for i in range(40):
        ws = w[labels == i]
        agree += (ws == np.bincount(ws).argmax()).mean()
    assert agree / 40 > 0.8, f"within-cluster word agreement {agree/40}"
    # words in range
    assert w.min() >= 0 and w.max() < vocab.n_words
    g = np.asarray(g)
    assert g.min() >= 0 and g.max() < vocab.k


def test_padding_is_masked():
    descs, *_ = _clustered_descs(10, 10)
    vocab = Vocabulary.train(descs, k=8, levels=2)
    valid = np.ones(len(descs), bool)
    valid[50:] = False
    w, g, bow = vocab.transform(jnp.asarray(descs), jnp.asarray(valid))
    w = np.asarray(w)
    assert (w[50:] == -1).all()
    assert (w[:50] >= 0).all()
    np.testing.assert_allclose(float(jnp.sum(bow)), 1.0, atol=1e-5)


def test_bow_score_discriminates():
    descs, labels, centers = _clustered_descs()
    vocab = Vocabulary.train(descs, k=8, levels=2)
    a = jnp.asarray(descs[labels < 20])
    a2 = jnp.asarray(descs[labels < 20][::-1])  # same content, different order
    b = jnp.asarray(descs[labels >= 20])
    va = jnp.ones(a.shape[0], bool)
    _, _, bow_a = vocab.transform(a, va)
    _, _, bow_a2 = vocab.transform(a2, va)
    _, _, bow_b = vocab.transform(b, jnp.ones(b.shape[0], bool))
    s_same = float(vocab.score(bow_a, bow_a2))
    s_diff = float(vocab.score(bow_a, bow_b))
    assert s_same > 0.99
    assert s_diff < s_same - 0.2, f"same={s_same} diff={s_diff}"
