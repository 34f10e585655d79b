"""On-device patch sampling: shapes, bounds, augmentation + epoch law,
ragged banks, train integration."""

import jax
import numpy as np
import pytest

from repmode_tpu.data.device_sampler import DeviceVolumeBank, make_device_sampler
from repmode_tpu.data.store import VolumeRecord, VolumeStore
from repmode_tpu.data.synthetic import synthetic_store


@pytest.fixture(scope="module")
def bank():
    store = synthetic_store(("a", "b"), volumes_per_task=3, vol_shape=(12, 24, 24))
    return DeviceVolumeBank.from_store(store), store


def test_bank_shapes(bank):
    b, store = bank
    assert b.num_volumes == 6
    assert b.vol_shape == (12, 24, 24)
    np.testing.assert_array_equal(
        np.asarray(b.extents), np.tile([12, 24, 24], (6, 1))
    )


def test_sample_shapes_and_determinism(bank):
    b, _ = bank
    sample, steps = make_device_sampler(b, batch_size=4, patch_size=(8, 16, 16))
    assert steps == 2  # ceil(6 / 4)
    out1 = sample(jax.random.PRNGKey(7), 0, 0)
    out2 = sample(jax.random.PRNGKey(7), 0, 0)
    assert out1["signal"].shape == (4, 8, 16, 16, 1)
    assert out1["task"].shape == (4,)
    np.testing.assert_array_equal(out1["signal"], out2["signal"])  # keyed
    out3 = sample(jax.random.PRNGKey(7), 1, 0)  # new epoch, new permutation
    assert not np.allclose(out1["signal"], out3["signal"])


def test_patches_come_from_volumes(bank):
    """Every sampled patch must be an actual (possibly flipped) sub-block of
    the volume matching its task."""
    b, store = bank
    sample, _ = make_device_sampler(b, batch_size=6, patch_size=(8, 16, 16),
                                    flip_prob=0.0)
    out = sample(jax.random.PRNGKey(3), 0, 0)
    sigs = np.asarray(out["signal"])[..., 0]
    tasks = np.asarray(out["task"])
    for i in range(6):
        candidates = [r for r in store.records if r.task == tasks[i]]
        found = False
        patch = sigs[i]
        for r in candidates:
            v = r.signal
            for d0 in range(v.shape[0] - 8 + 1):
                for h0 in range(v.shape[1] - 16 + 1):
                    for w0 in range(v.shape[2] - 16 + 1):
                        if np.array_equal(v[d0:d0+8, h0:h0+16, w0:w0+16], patch):
                            found = True
                            break
                    if found:
                        break
                if found:
                    break
            if found:
                break
        assert found, f"patch {i} not found in any task-{tasks[i]} volume"


def test_flip_probability_law(bank):
    """With flip_prob=1 every patch is fully flipped; with 0 none are."""
    b, store = bank
    s0, _ = make_device_sampler(b, 4, (8, 16, 16), flip_prob=0.0)
    s1, _ = make_device_sampler(b, 4, (8, 16, 16), flip_prob=1.0)
    o0 = s0(jax.random.PRNGKey(0), 0, 0)
    o1 = s1(jax.random.PRNGKey(0), 0, 0)
    # same key -> same volume/crop draws; flipped version must equal
    # flipping the unflipped sample on all axes
    np.testing.assert_allclose(
        np.asarray(o1["signal"])[..., 0],
        np.flip(np.asarray(o0["signal"])[..., 0], axis=(1, 2, 3)),
        rtol=1e-6,
    )


def _identity_bank(n_vol, shapes):
    """Bank whose volume i is constant (i+1) with task id i — samples are
    attributable to their source volume."""
    recs = []
    for i, shp in enumerate(shapes):
        v = np.full(shp, float(i + 1), np.float32)
        recs.append(VolumeRecord(v, v.copy(), f"t{i}", i, {}))
    store = VolumeStore(recs, tuple(f"t{i}" for i in range(n_vol)))
    return DeviceVolumeBank.from_store(store)


def test_once_per_volume_epoch_law():
    """Reference law (SSPdataset + shuffled DataLoader): each epoch visits
    every volume exactly once, plus <= B-1 random tail pads."""
    n, b = 7, 3  # steps = 3, padded to 9 -> 2 tail pads
    bank = _identity_bank(n, [(8, 16, 16)] * n)
    sample, steps = make_device_sampler(bank, b, (8, 16, 16))
    assert steps == 3
    for epoch in range(3):
        seen = []
        for s in range(steps):
            seen.extend(np.asarray(
                sample(jax.random.PRNGKey(5), epoch, s)["task"]).tolist())
        counts = np.bincount(seen, minlength=n)
        assert counts.min() >= 1, counts       # every volume visited
        assert counts.sum() == steps * b
        assert (counts - 1).sum() == steps * b - n  # only tail pads repeat
    # different epochs produce different orders
    e0 = [np.asarray(sample(jax.random.PRNGKey(5), 0, s)["task"]) for s in range(steps)]
    e1 = [np.asarray(sample(jax.random.PRNGKey(5), 1, s)["task"]) for s in range(steps)]
    assert not all(np.array_equal(a, c) for a, c in zip(e0, e1))


def test_ragged_bank_padding_never_read():
    """Non-uniform volumes: crops are bounded by true extents, so the zero
    padding of the bank never leaks into a sampled patch."""
    shapes = [(8, 16, 16), (10, 20, 18), (12, 24, 24)]
    bank = _identity_bank(3, shapes)
    assert bank.vol_shape == (12, 24, 24)
    sample, steps = make_device_sampler(bank, 3, (8, 16, 16))
    for epoch in range(4):
        for s in range(steps):
            out = sample(jax.random.PRNGKey(1), epoch, s)
            sig = np.asarray(out["signal"])[..., 0]
            task = np.asarray(out["task"])
            for i in range(3):
                expected = float(task[i] + 1)
                assert np.all(sig[i] == expected), (
                    f"padding leaked: task {task[i]} patch contains "
                    f"values other than {expected}"
                )


def test_volume_smaller_than_patch_rejected():
    bank = _identity_bank(2, [(8, 16, 16), (4, 16, 16)])
    with pytest.raises(ValueError, match="smaller than the patch"):
        make_device_sampler(bank, 2, (8, 16, 16))


def test_train_step_integration(bank):
    """Sampling feeds the jitted train step end-to-end on device."""
    from repmode_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from repmode_tpu.train import create_train_state, make_train_step

    b, _ = bank
    cfg = Config(
        model=ModelConfig(mult_chan=2, depth=2),
        train=TrainConfig(batch_size=2, patch_size=(8, 16, 16), compute_dtype="float32"),
        data=DataConfig(adopted_datasets=("a", "b")),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    sample, steps = make_device_sampler(b, 2, (8, 16, 16))
    key = jax.random.PRNGKey(0)
    m = None
    for s in range(steps):
        state, m = step(state, sample(key, 0, s))
    assert np.isfinite(float(m["loss"]))


def test_sharded_sampling_under_mesh():
    """With a mesh the sampled batch comes out sharded on 'data'."""
    from repmode_tpu.parallel import make_mesh

    bank = _identity_bank(8, [(8, 16, 16)] * 8)
    mesh = make_mesh(8)
    sample, steps = make_device_sampler(bank, 8, (8, 16, 16), mesh=mesh)
    out = sample(jax.random.PRNGKey(0), 0, 0)
    assert len(out["signal"].sharding.device_set) == 8
    counts = np.bincount(np.asarray(out["task"]), minlength=8)
    assert counts.min() == 1  # the whole epoch in one batch
