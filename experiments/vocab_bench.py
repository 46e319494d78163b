"""Reference-scale vocabulary bench (VERDICT r03 missing #5 / item #8).

Loads the trained 100k-leaf DBoW2-format vocabulary through
`load_dbow2_text` (the ORBvoc.txt path, ORBVocabulary.cpp:13) and
measures, at frame rate shapes (1024 keypoints):

- per-frame `transform` latency (batched tree descent) on the current
  default device;
- BoW-gate quality on real consecutive rendered frames: recall of the
  dense matcher's matches under the node gate (SearchByBow keeps only
  same-node candidate pairs, ORBMatcher.cpp:131-185) and the candidate-
  pair reduction factor (the speedup the reference buys with the gate);
- load time + memory of the dense tree.

Usage: python experiments/vocab_bench.py [vocab_path] [--cpu]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    import jax
    import jax.numpy as jnp

    from monoorbslam3_tpu.config import build_system
    from monoorbslam3_tpu.ops.matching import match_descriptors
    from monoorbslam3_tpu.ops.vocab import load_dbow2_text
    from monoorbslam3_tpu.runners.synth import SyntheticDataset

    path = next((a for a in sys.argv[1:] if not a.startswith("--")),
                "settings/synthetic_voc_100k.txt.gz")
    out = {"vocab": path, "device": str(jax.devices()[0])}

    t0 = time.perf_counter()
    vocab = load_dbow2_text(path, group_level=2)
    out["load_s"] = round(time.perf_counter() - t0, 2)
    out["k"] = vocab.k
    out["levels"] = vocab.levels
    out["n_words"] = vocab.n_words
    out["tree_mb"] = round(np.asarray(vocab.node_desc).nbytes / 2**20, 1)

    # two consecutive frames from the circle world through the public
    # extractor — the real descriptor distribution the gate must serve
    system = build_system("settings/synthetic.yaml")
    ds = SyntheticDataset("circle:t_end=1,fps=20", system.camera,
                          system.calib)
    frames = []
    for i, (t, img, imu) in enumerate(ds.frames()):
        if i in (0, 2):
            o = system.extractor(np.asarray(img, np.float32))
            frames.append((np.asarray(o["desc"]), np.asarray(o["valid"]),
                           np.asarray(o["xy"])))
        if i >= 2:
            break
    (d1, v1, _), (d2, v2, _) = frames

    # --- transform latency (amortized over reps in one dispatch chain) ---
    dj, vj = jnp.asarray(d1), jnp.asarray(v1)
    w, g, bow = vocab.transform(dj, vj)  # compile
    jax.block_until_ready(w)
    reps = 100
    t0 = time.perf_counter()
    outs = [vocab.transform(dj, vj)[0] for _ in range(reps)]
    jax.block_until_ready(outs)
    out["transform_ms_per_frame"] = round(
        (time.perf_counter() - t0) / reps * 1e3, 3)

    w1, g1, _ = (np.asarray(x) for x in vocab.transform(dj, vj))
    w2, g2, _ = (np.asarray(x) for x in
                 vocab.transform(jnp.asarray(d2), jnp.asarray(v2)))

    # --- dense reference matches (mutual-best + ratio, the production
    # matcher) ---
    pair_mask = jnp.asarray(v1)[:, None] & jnp.asarray(v2)[None, :]
    m12, dist = (np.asarray(x) for x in match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), pair_mask))
    good = m12 >= 0
    out["dense_matches"] = int(good.sum())

    # --- node-gate recall at each grouping level ---
    for lvl in range(1, vocab.levels):
        # group ids at level lvl for every descriptor: re-descend
        from monoorbslam3_tpu.ops.vocab import Vocabulary

        v_l = Vocabulary(vocab.k, vocab.levels, vocab.node_desc,
                         vocab.level_offset, vocab.word_idf, lvl)
        a1 = np.asarray(v_l.transform(dj, vj)[1])
        a2 = np.asarray(v_l.transform(jnp.asarray(d2), jnp.asarray(v2))[1])
        same = a1[good] == a2[m12[good]]
        recall = float(same.mean()) if good.any() else 0.0
        # candidate-pair reduction: sum over groups n1_g * n2_g vs n1 * n2
        n1 = np.bincount(a1[v1][a1[v1] >= 0])
        n2 = np.bincount(a2[v2][a2[v2] >= 0],
                         minlength=len(n1))
        n1 = np.pad(n1, (0, max(0, len(n2) - len(n1))))
        pairs = float((n1 * n2).sum())
        dense_pairs = float(v1.sum() * v2.sum())
        out[f"gate_L{lvl}"] = {
            "recall_of_dense": round(recall, 4),
            "pair_reduction_x": round(dense_pairs / max(pairs, 1.0), 1),
        }

    print(json.dumps(out, indent=1))
    with open("/tmp/vocab_bench.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
