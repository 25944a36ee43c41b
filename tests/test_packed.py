import numpy as np

from dualhyp_tpu.data.packed import (
    CombinedDataset,
    PackedDataset,
    PackedDatasetBuilder,
)


def test_builder_and_reader_roundtrip(tmp_path):
    builder = PackedDatasetBuilder(tmp_path, "train", chunk_size=32, sep_token=0)
    docs = [np.arange(1, 21), np.arange(100, 125), np.arange(7, 19)]
    for doc in docs:
        builder.add_array(doc)
    builder.write_reminder()
    assert len(builder.filenames) >= 2

    ds = PackedDataset(builder.filenames, block_size=8, shuffle=False)
    blocks = list(ds)
    assert all(b.shape == (8,) for b in blocks)
    flat = np.concatenate(blocks)
    # every document's tokens appear in order within the stream
    stream = list(flat)
    for doc in docs:
        joined = ",".join(map(str, doc))
        assert joined in ",".join(map(str, stream))


def test_shard_per_worker(tmp_path):
    builder = PackedDatasetBuilder(tmp_path, "w", chunk_size=16)
    for i in range(6):
        builder.add_array(np.full(16, i))
    builder.write_reminder()
    files = builder.filenames
    w0 = PackedDataset(files, block_size=16, shuffle=False, worker_index=0, num_workers=2)
    w1 = PackedDataset(files, block_size=16, shuffle=False, worker_index=1, num_workers=2)
    v0 = {int(b[0]) for b in w0}
    v1 = {int(b[0]) for b in w1}
    assert v0 | v1 == {0, 1, 2, 3, 4, 5}
    assert v0.isdisjoint(v1)


def test_combined_dataset_weights(tmp_path):
    a = [np.zeros(4, np.int64)] * 50
    b = [np.ones(4, np.int64)] * 50
    combined = list(CombinedDataset([iter(a), iter(b)], weights=[0.9, 0.1], seed=3))
    assert len(combined) == 100
    frac_a = np.mean([int(x[0] == 0) for x in combined[:60]])
    assert frac_a > 0.6  # heavily weighted toward dataset a early on
