"""Probe the host->device link: H2D bandwidth vs concurrent stream count.

The tunneled-TPU transport moves one TCP flow per transfer; on a congested
link more concurrent flows claim a larger aggregate share (TCP fairness),
on a quiet link ~2 flows saturate it. This probe sizes QUBER_H2D_STREAMS
for the serving/bench path (quber_tpu.predictor.device_put_split).

Run standalone (never concurrently with another TPU process):

    python tools/probe_link.py [--mb 24] [--iters 3]
"""

from __future__ import annotations

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=24, help="payload size per trial")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--streams", type=int, nargs="*", default=[1, 2, 4, 6])
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from quber_tpu.predictor import device_put_split

    print(f"devices={jax.devices()}")
    payload = np.random.RandomState(0).randint(
        0, 255, (args.mb << 20,), np.uint8
    ).reshape(args.mb, 1 << 20)

    # warm up the transport (first transfers stall on connection setup)
    jnp.asarray(payload[:2]).block_until_ready()
    _ = np.asarray(jnp.sum(jnp.asarray(payload[:2])))  # fence via D2H

    for s in args.streams:
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            d = device_put_split(payload, min_bytes=0, streams=s)
            # block_until_ready does not fence this transport; fence with a
            # small on-device reduction + D2H of the scalar batched into a
            # >=300 KB readback (element-wise small-D2H is ~65 ms/element)
            _ = np.asarray(jnp.broadcast_to(jnp.sum(d[:1]), (100_000,)))
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"streams={s}: {args.mb / med:6.1f} MB/s  (median of {args.iters})")


if __name__ == "__main__":
    main()
