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


def test_node_gate_sentinel_semantics():
    from monoorbslam3_tpu.ops.matching import node_gate

    ga = jnp.asarray(np.array([0, 1, -1], np.int32))
    gb = jnp.asarray(np.array([0, 2, 5], np.int32))
    m = np.asarray(node_gate(ga, gb))
    # row 0 (group 0): matches only column 0 (group 0) and nothing else
    assert m[0, 0] and not m[0, 1] and not m[0, 2]
    # row 1 (group 1): no same-group column -> all blocked
    assert not m[1].any()
    # row 2 (-1 = no BoW info): passes everything
    assert m[2].all()


def test_bow_gated_pipeline_tracks():
    """Integration: a vocabulary-enabled System (SearchByBow +
    BoW-gated SearchForTriangulation paths live) initializes and tracks the
    synthetic world — the BoW gate must not starve matching."""
    from tests.test_e2e_synthetic import (
        BA_TRUE, BG_TRUE, CALIB, CAM, N_FEAT, R_BC, T_BC, _make_feats,
    )
    from monoorbslam3_tpu.frontend import tracking as T
    from monoorbslam3_tpu.sim import Trajectory, World
    from monoorbslam3_tpu.system import System

    traj = Trajectory()
    world = World(traj=traj, n_points=3000, seed=5)
    rng0 = np.random.default_rng(7)
    r = rng0.uniform(traj.radius + 1.0, traj.radius + 4.0, 3000)
    th = rng0.uniform(0, 2 * np.pi, 3000)
    z = rng0.uniform(-2.0, 3.0, 3000)
    world.points = np.stack([r * np.cos(th), r * np.sin(th), z], axis=-1)
    rng = np.random.default_rng(9)

    # train the vocabulary on the world's landmark descriptors (the
    # in-process replacement for loading a 145 MB ORBvoc.txt)
    vocab = Vocabulary.train(world.desc[:1500], k=8, levels=2,
                             group_level=1, seed=0)

    sys = System(CAM, CALIB, config={
        "n_features": N_FEAT, "init_min_features": 100,
        "init_min_matches": 60, "local_k": 16, "local_p": 1024,
        "local_o": 3072, "local_pt_cap": 1024, "imu_init_kfs": 10,
        "max_pt": 16384, "kf_max_interval": 0.25, "kf_tracked_ratio": 0.85,
    }, vocab=vocab)

    fps, imu_hz = 20.0, 200.0
    frame_times = np.arange(0.0, 3.0, 1.0 / fps)
    states = []
    last_t = 0.0
    for i, t in enumerate(frame_times):
        obs = world.observe(t, CAM, R_BC, T_BC, noise_px=0.3, flip_bits=4,
                            max_kps=N_FEAT, rng=rng)
        imu = None
        if i > 0:
            g, a, d = traj.imu_samples(last_t, t, imu_hz, bg=BG_TRUE,
                                       ba=BA_TRUE, noise_gyro=1.7e-4,
                                       noise_acc=2e-3, rng=rng)
            ts = last_t + np.cumsum(d)
            imu = np.concatenate([ts[:, None], g, a], axis=1)
        states.append(sys.track_features(t, _make_feats(obs), imu))
        last_t = t
    states = np.asarray(states)

    ok = states == T.OK
    assert ok.any(), "never initialized with BoW gating enabled"
    assert ok.mean() > 0.7, f"only {ok.mean():.0%} frames OK under BoW gating"
    # the KF store carries real vocabulary groups
    k = sys.store.keyframe_ids()[0]
    grp = sys.store.kf_feat_group[k][sys.store.kf_feat_valid[k]]
    assert (grp >= 0).all()
    # and the mapper still triangulates under the node gate
    assert sys.store.pt_valid.sum() > 100


def test_load_dbow2_text_roundtrip(tmp_path):
    """Handcrafted DBoW2-format text file (the ORBvoc.txt layout: header
    `k L scoring weighting`, then per node `parent is_leaf 32bytes weight`
    in creation order) loads into the dense tree and routes descriptors to
    the expected words/groups."""
    from monoorbslam3_tpu.ops.vocab import load_dbow2_text

    # k=2, L=2: root -> nodes 1,2 -> leaves 3,4 (under 1) and 5,6 (under 2).
    # Coherent hierarchy: branch 1 near all-zeros, branch 2 near all-ones,
    # so each leaf descriptor descends through its own parent.
    def desc_bytes(base, tweak):
        b = np.full(32, base, np.uint8)
        b[0] = tweak
        return b

    d = {1: desc_bytes(0x00, 0x00), 2: desc_bytes(0xFF, 0xFF),
         3: desc_bytes(0x00, 0x01), 4: desc_bytes(0x00, 0x06),
         5: desc_bytes(0xFF, 0xFE), 6: desc_bytes(0xFF, 0xF9)}
    lines = ["2 2 0 0"]
    for fid, pid, leaf in [(1, 0, 0), (2, 0, 0), (3, 1, 1), (4, 1, 1),
                           (5, 2, 1), (6, 2, 1)]:
        lines.append(" ".join([str(pid), str(leaf)]
                              + [str(b) for b in d[fid]] + [f"{0.5 + fid:.1f}"]))
    path = tmp_path / "voc.txt"
    path.write_text("\n".join(lines) + "\n")

    vocab = load_dbow2_text(str(path), group_level=1)
    assert vocab.k == 2 and vocab.levels == 2 and vocab.n_words == 4
    # leaf idf weights landed in slot order (3->0, 4->1, 5->2, 6->3)
    np.testing.assert_allclose(np.asarray(vocab.word_idf), [3.5, 4.5, 5.5, 6.5])

    # exact-leaf descriptors route to their own word through the tree
    queries = np.stack([d[3], d[6], d[4], d[5]]).view(np.uint32)
    w, g, _ = vocab.transform(jnp.asarray(queries), jnp.ones(4, bool))
    # tree descent: word slot = parent_slot*k + child; groups at level 1
    assert list(np.asarray(w)) == [0, 3, 1, 2]
    assert list(np.asarray(g)) == [0, 1, 0, 1]


def test_save_dbow2_text_roundtrip(tmp_path):
    """A trained vocabulary written by save_dbow2_text loads back
    bit-identical (tree descriptors, idf weights, and routing) — the
    shipped settings/synthetic_voc.txt artifact relies on this."""
    from monoorbslam3_tpu.ops.vocab import (
        Vocabulary, load_dbow2_text, save_dbow2_text,
    )

    rng = np.random.default_rng(4)
    descs = rng.integers(0, 2**32, (600, 8), dtype=np.uint32)
    vocab = Vocabulary.train(descs, k=4, levels=3, group_level=2, seed=1)
    path = tmp_path / "voc.txt"
    save_dbow2_text(vocab, str(path))
    v2 = load_dbow2_text(str(path), group_level=2)
    assert (v2.k, v2.levels, v2.level_offset) == (
        vocab.k, vocab.levels, vocab.level_offset)
    np.testing.assert_array_equal(np.asarray(v2.node_desc),
                                  np.asarray(vocab.node_desc))
    np.testing.assert_allclose(np.asarray(v2.word_idf),
                               np.asarray(vocab.word_idf), atol=1e-5)
    q = jnp.asarray(descs[:128])
    ones = jnp.ones(128, bool)
    w1, g1, _ = vocab.transform(q, ones)
    w2, g2, _ = v2.transform(q, ones)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_shipped_synthetic_vocabulary_loads():
    """The settings artifact: the reference-scale 100k-leaf gzipped
    vocabulary (k=10 L=5, the ORBvoc.txt shape) loads through the same
    DBoW2 text path, with corpus tf-idf weights present."""
    import os

    from monoorbslam3_tpu.config import build_vocabulary, load_settings

    base = os.path.join(os.path.dirname(__file__), "..", "settings")
    settings = load_settings(os.path.join(base, "synthetic_vocab.yaml"))
    vocab = build_vocabulary(settings, base_dir=base)
    assert vocab is not None
    assert vocab.k == 10 and vocab.levels == 5
    assert vocab.n_words == 100_000 and vocab.group_level == 1
    idf = np.asarray(vocab.word_idf)
    assert (idf > 0).sum() > 50_000  # corpus-trained tf-idf, not uniform
