"""Data pipeline: bucketing, collation, dummy dataset, LJSpeech parsing."""

import numpy as np

from m2tts_tpu.data.dataset import (
    DummyDataset, TTSDataset, collate, data_iterator, make_batches,
    select_bucket, uniform_durations,
)
from m2tts_tpu.frontend.audio import save_wav


def test_uniform_durations_reference_quirk():
    # avg assigned to the FIRST text_length positions, zeros beyond
    d = uniform_durations(n_ids=10, text_length=4, mel_length=20)
    assert d.shape == (10,)
    np.testing.assert_allclose(d[:4], 5.0)
    np.testing.assert_allclose(d[4:], 0.0)
    assert uniform_durations(5, 0, 20).sum() == 0.0


def test_select_bucket():
    buckets = [(64, 256), (128, 512), (256, 1000)]
    assert select_bucket(10, 100, buckets) == (64, 256)
    assert select_bucket(10, 300, buckets) == (128, 512)
    assert select_bucket(200, 100, buckets) == (256, 1000)
    assert select_bucket(500, 2000, buckets) == (256, 1000)  # cap


def test_dummy_dataset_schema():
    ds = DummyDataset(size=4, mel_dim=16, seed=3)
    s = ds[0]
    assert s["mel"].shape[1] == 16
    assert s["phoneme_ids"].dtype == np.int32
    assert len(s["durations"]) == len(s["phoneme_ids"])
    assert abs(s["durations"].sum() - float(s["mel_length"])) < 1.0
    assert s["audio"].shape[0] == int(s["mel_length"]) * 256
    # deterministic given seed
    ds2 = DummyDataset(size=4, mel_dim=16, seed=3)
    np.testing.assert_array_equal(ds[1]["phoneme_ids"], ds2[1]["phoneme_ids"])


def test_make_batches_fixed_shapes():
    ds = DummyDataset(size=32, mel_dim=8, max_text_length=40,
                      max_mel_length=150, seed=0)
    buckets = [(20, 80), (40, 150)]
    seen_shapes = set()
    n = 0
    for batch in make_batches(ds, 4, buckets, seed=1):
        assert batch["phoneme_ids"].shape[0] == 4
        assert (batch["phoneme_ids"].shape[1], batch["mel"].shape[1]) in buckets
        assert batch["mel"].shape[2] == 8
        seen_shapes.add(batch["mel"].shape)
        n += 1
    assert n >= 4
    assert len(seen_shapes) <= len(buckets)


def test_collate_audio_segments():
    ds = DummyDataset(size=4, mel_dim=8, seed=0)
    batch = collate([ds[0], ds[1]], (40, 150), audio_samples=1024)
    assert batch["audio"].shape == (2, 1024)
    np.testing.assert_allclose(batch["audio"][0], ds[0]["audio"][:1024])


def test_data_iterator_infinite():
    ds = DummyDataset(size=8, mel_dim=8, seed=0)
    it = data_iterator(ds, 2, [(64, 256)], seed=0)
    batches = [next(it) for _ in range(10)]  # > one epoch
    assert len(batches) == 10


def test_ljspeech_ingest_and_cache(tmp_path):
    # build a tiny fake LJSpeech corpus
    wavs = tmp_path / "wavs"
    wavs.mkdir(parents=True)
    sr = 22050
    rng = np.random.default_rng(0)
    lines = []
    for i in range(3):
        audio = 0.3 * np.sin(2 * np.pi * 220 * np.arange(sr // 4) / sr)
        audio += 0.01 * rng.normal(size=audio.shape)
        save_wav(audio.astype(np.float32), wavs / f"utt{i}.wav", sr)
        lines.append(f"utt{i}|Hello world {i}|hello world {i}")
    (tmp_path / "metadata.csv").write_text("\n".join(lines))

    ds = TTSDataset(tmp_path, keep_audio=True)
    assert len(ds) == 3
    s = ds[0]
    assert s["mel"].shape[1] == 64  # [T, C] channel-last
    assert s["mel_length"] == s["mel"].shape[0]
    assert s["audio"].ndim == 1
    assert s["durations"].shape == s["phoneme_ids"].shape
    # cache hit on re-init
    ds2 = TTSDataset(tmp_path, keep_audio=True)
    assert len(ds2) == 3
    np.testing.assert_allclose(ds2[0]["mel"], s["mel"])
    assert (tmp_path / "cache").exists()


def test_subset_cache_never_poisons_full_runs(tmp_path):
    """A subset run's cache must not be served to a later full-corpus run
    (the cache file is written post-truncation, so the tag carries the
    subset size), and subset ingest stops processing at subset_size."""
    wavs = tmp_path / "wavs"
    wavs.mkdir(parents=True)
    sr = 22050
    lines = []
    for i in range(4):
        audio = 0.3 * np.sin(2 * np.pi * (200 + 20 * i)
                             * np.arange(sr // 4) / sr)
        save_wav(audio.astype(np.float32), wavs / f"utt{i}.wav", sr)
        lines.append(f"utt{i}|Sample {i}|sample {i}")
    (tmp_path / "metadata.csv").write_text("\n".join(lines))

    sub = TTSDataset(tmp_path, subset_size=2)
    assert len(sub) == 2
    full = TTSDataset(tmp_path)  # must NOT hit the subset cache
    assert len(full) == 4
    # both caches coexist under distinct tags
    assert len(list((tmp_path / "cache").glob("processed_*.pkl"))) == 2


def test_paired_files_ingest(tmp_path):
    sr = 22050
    audio = 0.3 * np.sin(2 * np.pi * 220 * np.arange(sr // 4) / sr)
    save_wav(audio.astype(np.float32), tmp_path / "a.wav", sr)
    (tmp_path / "a.txt").write_text("hello world")
    ds = TTSDataset(tmp_path, keep_audio=False)
    assert len(ds) == 1
    assert "audio" not in ds[0]


def test_collate_truncates_overlong_samples():
    """Samples beyond the cap bucket are clipped to it, lengths clamped."""
    ds = DummyDataset(size=6, mel_dim=8, max_text_length=60,
                      max_mel_length=400, seed=1)
    bucket = (20, 100)
    batch = collate([ds[i] for i in range(4)], bucket)
    assert batch["phoneme_ids"].shape == (4, 20)
    assert batch["mel"].shape == (4, 100, 8)
    assert (batch["text_lengths"] <= 20).all()
    assert (batch["mel_lengths"] <= 100).all()


def test_make_batches_drop_last_false_pads_by_cycling():
    ds = DummyDataset(size=10, mel_dim=8, max_text_length=40,
                      max_mel_length=150, seed=0)
    buckets = [(64, 256)]
    full = list(make_batches(ds, 4, buckets, seed=0, drop_last=False))
    dropped = list(make_batches(ds, 4, buckets, seed=0, drop_last=True))
    assert len(full) == len(dropped) + 1  # 10 = 2 full + 1 padded
    assert all(b["phoneme_ids"].shape[0] == 4 for b in full)


def test_create_dataloader_reiterates_fresh_epochs():
    from m2tts_tpu.data.dataset import create_dataloader

    ds = DummyDataset(size=16, mel_dim=8, max_text_length=40,
                      max_mel_length=150, seed=0)
    dl = create_dataloader(ds, batch_size=4, buckets=[(64, 256)], seed=0)
    e1 = list(dl)
    e2 = list(dl)
    assert len(e1) == len(dl) == 4
    # different epoch -> different shuffle order (same content overall)
    assert not all(np.array_equal(a["phoneme_ids"], b["phoneme_ids"])
                   for a, b in zip(e1, e2))


def test_data_iterator_pads_tiny_datasets():
    """Dataset smaller than one batch still yields full fixed-shape
    batches (pad-repeat), and stays infinite."""
    ds = DummyDataset(size=3, mel_dim=8, max_text_length=40,
                      max_mel_length=150, seed=0)
    it = data_iterator(ds, 8, [(64, 256)], seed=0)
    for _ in range(4):
        b = next(it)
        assert b["phoneme_ids"].shape[0] == 8


def test_padded_leftover_batches_carry_real_sample_count():
    """drop_last=False pads by cycling; n_valid records the REAL count so
    metric consumers can exclude the duplicates (ADVICE r2)."""
    ds = DummyDataset(size=10, mel_dim=8, max_text_length=40,
                      max_mel_length=150, seed=0)
    batches = list(make_batches(ds, 4, [(64, 256)], seed=0,
                                drop_last=False))
    counts = sorted(int(b["n_valid"]) for b in batches)
    assert counts == [2, 4, 4]  # 10 = 4 + 4 + (2 padded to 4)
    # n_valid is 0-d so device-transfer paths can skip it
    assert all(b["n_valid"].ndim == 0 for b in batches)


def test_dataloader_len_counts_per_bucket():
    """__len__ must follow the per-bucket emission rule, not
    len(dataset)//batch_size (ADVICE r2): with two buckets the global
    divmod over- or under-counts."""
    from m2tts_tpu.data.dataset import DataLoader

    class TwoBucketDS:
        # 6 short samples + 5 long ones, batch_size 4:
        #   drop_last=True  -> 1 + 1 = 2 batches (divmod says 2 too; per
        #   bucket: short 6//4=1, long 5//4=1)
        #   drop_last=False -> 2 + 2 = 4 batches (divmod says 3)
        def __len__(self):
            return 11

        def __getitem__(self, i):
            long = i >= 6
            ml = 200 if long else 80
            return {"phoneme_ids": np.ones(30 if long else 10, np.int32),
                    "text_length": 30 if long else 10,
                    "durations": np.ones(30 if long else 10, np.float32),
                    "mel": np.zeros((ml, 8), np.float32),
                    "mel_length": ml}

    ds = TwoBucketDS()
    buckets = [(16, 128), (64, 256)]
    for drop_last in (True, False):
        dl = DataLoader(ds, 4, buckets, shuffle=False, drop_last=drop_last)
        assert len(dl) == len(list(dl)), f"drop_last={drop_last}"
