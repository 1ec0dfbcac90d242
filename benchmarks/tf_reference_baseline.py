"""TF/Keras reference-architecture throughput baseline (CPU).

The reference repo publishes no numbers (BASELINE.md), so the operative
throughput baseline is its architecture executed on this host: a TF two-
tower with the same semantics as ref: pkg/modelling/models/
two_tower_model.py:94-124 (in-batch negatives, identity labels, SUM-reduced
softmax CE, logQ correction, Adagrad 0.05) at H&M scale, driven by a
tf.function train step. Strings are pre-encoded to int ids exactly as our
pipeline does, so this measures model compute, not string lookup.

    python benchmarks/tf_reference_baseline.py [--steps 20] [--batch 512]

Writes the measured examples/s into stdout; the number is recorded in
BASELINE.md and used as ``vs_baseline`` denominator by bench.py.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--customers", type=int, default=1_371_980)
    ap.add_argument("--articles", type=int, default=105_542)
    args = ap.parse_args()

    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")

    E, HID, JOINT = 128, 256, 128
    B = args.batch

    init = tf.keras.initializers.RandomUniform(-0.05, 0.05)
    emb_customer = tf.Variable(
        init((args.customers + 1, E)), name="emb_customer"
    )
    emb_article = tf.Variable(
        init((args.articles + 1, E)), name="emb_article"
    )
    emb_ptype = tf.Variable(init((131, 16)), name="emb_ptype")
    emb_colour = tf.Variable(init((51, 8)), name="emb_colour")

    glorot = tf.keras.initializers.GlorotUniform()

    def dense_vars(din, dout, name):
        return (
            tf.Variable(glorot((din, dout)), name=f"{name}_w"),
            tf.Variable(tf.zeros((dout,)), name=f"{name}_b"),
        )

    q_h = dense_vars(E, HID, "qh")
    q_o = dense_vars(HID, JOINT, "qo")
    c_h = dense_vars(E + 16 + 8, HID, "ch")
    c_o = dense_vars(HID, JOINT, "co")

    logq = tf.constant(
        np.log(
            np.random.default_rng(0).dirichlet(
                np.full(args.articles + 1, 0.5)
            )
            + 1e-12
        ).astype(np.float32)
    )

    opt = tf.keras.optimizers.Adagrad(
        learning_rate=0.05, initial_accumulator_value=0.1, epsilon=1e-7
    )
    trainables = [
        emb_customer,
        emb_article,
        emb_ptype,
        emb_colour,
        *q_h,
        *q_o,
        *c_h,
        *c_o,
    ]

    @tf.function(jit_compile=False)
    def train_step(cust, art, ptype, colour):
        with tf.GradientTape() as tape:
            q = tf.nn.embedding_lookup(emb_customer, cust)
            q = tf.nn.relu(q @ q_h[0] + q_h[1])
            q = tf.nn.relu(q @ q_o[0] + q_o[1])
            c = tf.concat(
                [
                    tf.nn.embedding_lookup(emb_article, art),
                    tf.nn.embedding_lookup(emb_ptype, ptype),
                    tf.nn.embedding_lookup(emb_colour, colour),
                ],
                axis=1,
            )
            c = tf.nn.relu(c @ c_h[0] + c_h[1])
            c = tf.nn.relu(c @ c_o[0] + c_o[1])
            logits = tf.matmul(q, c, transpose_b=True)
            logits -= tf.gather(logq, art)[None, :]
            labels = tf.eye(tf.shape(logits)[0])
            loss = tf.reduce_sum(
                tf.nn.softmax_cross_entropy_with_logits(
                    labels=labels, logits=logits
                )
            )
        grads = tape.gradient(loss, trainables)
        opt.apply_gradients(zip(grads, trainables))
        return loss

    rng = np.random.default_rng(0)

    def batch():
        return (
            tf.constant(
                rng.integers(0, args.customers + 1, B), tf.int32
            ),
            tf.constant(
                rng.integers(0, args.articles + 1, B), tf.int32
            ),
            tf.constant(rng.integers(0, 131, B), tf.int32),
            tf.constant(rng.integers(0, 51, B), tf.int32),
        )

    # warmup / trace
    train_step(*batch())
    t0 = time.time()
    for _ in range(args.steps):
        loss = train_step(*batch())
    _ = float(loss)
    dt = time.time() - t0
    eps = args.steps * B / dt
    print(
        f"tf_reference_cpu examples/s: {eps:.1f} "
        f"({dt / args.steps * 1e3:.1f} ms/step, B={B})"
    )


if __name__ == "__main__":
    main()
