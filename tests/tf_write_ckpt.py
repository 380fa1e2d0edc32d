"""Subprocess helper: write a TF1 TensorBundle checkpoint from an .npz.

TensorFlow, JAX, and torch loaded into ONE process eventually segfault
(observed at test #161 of a full-suite run), so the TF-backed tests
never import TF in-process: they serialize the variables to .npz and
shell out to this script, which is the only place TF runs.

Usage: tf_write_ckpt.py <arrays.npz> <ckpt_prefix>
"""

import sys

import numpy as np


def main(npz_path: str, prefix: str) -> None:
    import tensorflow as tf

    v1 = tf.compat.v1
    data = np.load(npz_path, allow_pickle=False)
    var_list = {
        name: tf.Variable(data[name], name=name.replace("/", "_"))
        for name in data.files
    }
    saver = v1.train.Saver(var_list=var_list)
    saver.save(None, prefix, write_meta_graph=False, write_state=False)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
