"""TPU-native two-tower retrieval framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the TF/Keras
reference `SelvinSelbaraju/hm-retrieval-two-tower`:

- feature schema with frequency-ordered vocabularies (ref: pkg/schema/)
- pandas ETL + columnar shard serialization (ref: pkg/etl/, pkg/tfrecord_writer/)
- streaming input pipeline feeding device-sharded batches
  (ref: pkg/modelling/tfrecord_dataset.py)
- two-tower model: per-feature embedding tables -> MLP towers -> dot-product
  scores, in-batch sampled-softmax with logQ correction
  (ref: pkg/modelling/models/, pkg/modelling/layers/)
- exact brute-force top-K retrieval + popularity baseline + streaming Recall@K
  (ref: pkg/modelling/indices/, pkg/modelling/metrics/)
- NEW (absent in the reference): a distributed layer -- named device mesh,
  global-batch negatives via all-gather, row-sharded embedding tables with
  all-to-all lookup, distributed top-k merge, and Pallas fused retrieval
  kernels.

Design rule: strings never reach the device. Vocabulary lookup happens in the
data pipeline (int32 ids, 0 = OOV); logQ is a dense table gather; retrieval
returns int ids with the id<->string mapping held host-side.
"""

import logging

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
)

__version__ = "0.1.0"
