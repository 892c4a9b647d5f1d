"""Async input pipeline tests: ordering, determinism vs synchronous loading,
exception propagation, early close (replaces reference train.py:55's
DataLoader(num_workers=4) semantics)."""

import threading
import time

import numpy as np
import pytest

from stabletts_tpu.data.prefetch import prefetch


def test_order_preserved_and_complete():
    items = list(range(57))

    def slow_square(i):
        # jitter so completion order != submission order
        time.sleep(0.001 * ((i * 7) % 5))
        return i * i

    got = list(prefetch(items, slow_square, n_workers=4, depth=8))
    assert got == [i * i for i in items]


def test_matches_sequential_map():
    items = [np.arange(i, i + 8) for i in range(23)]
    fn = lambda a: (a * 2.5).sum()
    assert list(prefetch(items, fn, n_workers=3, depth=5)) == [fn(a) for a in items]


def test_exception_propagates_at_item_position():
    def boom(i):
        if i == 5:
            raise ValueError("item 5")
        return i

    out = []
    with pytest.raises(ValueError, match="item 5"):
        for v in prefetch(range(10), boom, n_workers=2, depth=3):
            out.append(v)
    assert out == [0, 1, 2, 3, 4]


def test_early_close_does_not_hang():
    started = []

    def fn(i):
        started.append(i)
        return i

    gen = prefetch(range(1000), fn, n_workers=2, depth=4)
    assert next(gen) == 0
    gen.close()  # must not deadlock or leak threads
    # only a bounded amount of work ran
    assert len(started) <= 16


def test_runs_ahead_of_consumer():
    """With a slow consumer, the pipeline keeps `depth` items in flight."""
    seen = []
    lock = threading.Lock()

    def fn(i):
        with lock:
            seen.append(i)
        return i

    gen = prefetch(range(100), fn, n_workers=4, depth=8)
    assert next(gen) == 0
    time.sleep(0.2)  # consumer stalls; workers should have filled the window
    assert len(seen) >= 8
    gen.close()


@pytest.mark.slow
def test_train_prefetch_bit_identical_to_sync(tmp_path):
    """loader_workers=4 must produce bit-identical training to loader_workers=0
    — per-(seed, epoch, rank, batch) PRNG derivation makes batch randomness
    independent of worker scheduling."""
    import json
    import dataclasses

    import jax

    from stabletts_tpu.config import MelConfig, ModelConfig, TrainConfig
    from stabletts_tpu.train.train_tts import train

    tiny_model = ModelConfig(
        hidden_channels=32, filter_channels=64, n_heads=2,
        n_enc_layers=1, n_dec_layers=2, kernel_size=3, p_dropout=0.1, gin_channels=32,
    )
    tiny_mel = MelConfig(n_mels=16)
    rng = np.random.default_rng(0)
    filelist = tmp_path / "filelist.jsonl"
    with open(filelist, "w") as f:
        for i in range(16):
            T = int(rng.integers(40, 60))
            mel = rng.standard_normal((T, tiny_mel.n_mels)).astype(np.float32)
            mel_path = tmp_path / f"mel_{i}.npy"
            np.save(mel_path, mel)
            f.write(json.dumps({
                "mel_path": str(mel_path), "phone": ["a", "b", "d", "e"],
                "mel_length": T,
            }) + "\n")

    base = TrainConfig(
        train_dataset_path=str(filelist), batch_size=8, num_epochs=2,
        warmup_steps=1, bucket_boundaries=(32, 64, 128), max_text_len=16,
    )
    states = {}
    for workers in (0, 4):
        cfg = dataclasses.replace(
            base, loader_workers=workers,
            model_save_path=str(tmp_path / f"ckpt_{workers}"),
        )
        states[workers] = train(cfg, tiny_model, tiny_mel)

    p0 = jax.tree_util.tree_leaves(states[0].params)
    p4 = jax.tree_util.tree_leaves(states[4].params)
    for a, b in zip(p0, p4):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
