"""A/B the records feed paths: in-RAM materialization vs native streaming.

Measures, for a class-conditional .cnfrec dataset of configurable size:
- feed throughput (batches/s and samples/s) through a full epoch,
- peak RSS delta attributable to the source (bounded-memory claim,
  VERDICT round-1 item 5).

Run: python tools/records_ab.py [num_per_class] [batch]
Writes benchmarks/results/records_ab.json and prints it.
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    num_per_class = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tempfile

    from arl_conditional_normalizing_flows_tpu.data import records
    from arl_conditional_normalizing_flows_tpu.data.images import (
        ClassConditionalSource,
        synthetic_digits,
    )
    from arl_conditional_normalizing_flows_tpu.data.native_loader import (
        StreamingClassSource,
        native_available,
    )

    tmp = tempfile.mkdtemp(prefix="records_ab_")
    imgs, labels = synthetic_digits(num_per_class=num_per_class, num_classes=2)
    records.write_class_sorted_dataset(tmp, "train", imgs, labels, [0, 1], False)
    dataset_mb = imgs.nbytes / 1e6
    del imgs, labels

    key = jax.random.PRNGKey(0)
    out = {
        "dataset_mb": round(dataset_mb, 1),
        "num_per_class": num_per_class,
        "batch": batch,
        "native_loader": native_available(),
    }

    def drain(src, epochs=2):
        # warm epoch (jit of noise ops etc.), then timed epoch
        n = 0
        for xy in src.epoch(key, 0):
            xy.block_until_ready()
        t0 = time.perf_counter()
        for e in range(1, epochs + 1):
            for xy in src.epoch(key, e):
                xy.block_until_ready()
                n += 1
        dt = time.perf_counter() - t0
        return n / dt, n * batch / dt

    rss0 = rss_mb()
    stream = StreamingClassSource(
        [records.class_file(tmp, "train", 0), records.class_file(tmp, "train", 1)],
        [0, 1], batch, use_logits=True,
    )
    bps, sps = drain(stream)
    stream.close()
    out["streaming"] = {
        "batches_per_sec": round(bps, 1),
        "samples_per_sec": round(sps, 1),
        "rss_delta_mb": round(rss_mb() - rss0, 1),
    }

    rss1 = rss_mb()
    x0 = np.asarray(records.read_records(records.class_file(tmp, "train", 0)))
    x1 = np.asarray(records.read_records(records.class_file(tmp, "train", 1)))
    ram = ClassConditionalSource(
        np.concatenate([x0, x1]),
        np.concatenate([np.zeros(len(x0), np.int32), np.ones(len(x1), np.int32)]),
        [0, 1], batch, use_logits=True,
    )
    del x0, x1
    bps, sps = drain(ram)
    out["in_ram"] = {
        "batches_per_sec": round(bps, 1),
        "samples_per_sec": round(sps, 1),
        "rss_delta_mb": round(rss_mb() - rss1, 1),
    }

    res_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "benchmarks", "results")
    os.makedirs(res_dir, exist_ok=True)
    with open(os.path.join(res_dir, "records_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
