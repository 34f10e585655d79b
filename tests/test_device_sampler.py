"""On-device patch sampling: shapes, bounds, augmentation law, train integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repmode_tpu.data.device_sampler import DeviceVolumeBank, make_device_sampler
from repmode_tpu.data.synthetic import synthetic_store


@pytest.fixture(scope="module")
def bank():
    store = synthetic_store(("a", "b"), volumes_per_task=3, vol_shape=(12, 24, 24))
    return DeviceVolumeBank.from_store(store), store


def test_bank_shapes(bank):
    b, store = bank
    assert b.num_volumes == 6
    assert b.vol_shape == (12, 24, 24)


def test_sample_shapes_and_determinism(bank):
    b, _ = bank
    sample = make_device_sampler(b, batch_size=4, patch_size=(8, 16, 16))
    out1 = sample(jax.random.PRNGKey(7))
    out2 = sample(jax.random.PRNGKey(7))
    assert out1["signal"].shape == (4, 8, 16, 16, 1)
    assert out1["task"].shape == (4,)
    np.testing.assert_array_equal(out1["signal"], out2["signal"])  # keyed
    out3 = sample(jax.random.PRNGKey(8))
    assert not np.allclose(out1["signal"], out3["signal"])


def test_patches_come_from_volumes(bank):
    """Every sampled patch must be an actual (possibly flipped) sub-block of
    the volume matching its task."""
    b, store = bank
    sample = make_device_sampler(b, batch_size=8, patch_size=(8, 16, 16), flip_prob=0.0)
    out = sample(jax.random.PRNGKey(3))
    sigs = np.asarray(out["signal"])[..., 0]
    tasks = np.asarray(out["task"])
    for i in range(8):
        candidates = [r for r in store.records if r.task == tasks[i]]
        found = False
        patch = sigs[i]
        for r in candidates:
            # search all crop positions (small volumes)
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
    s0 = make_device_sampler(b, 4, (8, 16, 16), flip_prob=0.0)
    s1 = make_device_sampler(b, 4, (8, 16, 16), flip_prob=1.0)
    o0 = s0(jax.random.PRNGKey(0))
    o1 = s1(jax.random.PRNGKey(0))
    # same key -> same volume/crop draws; flipped version must equal
    # flipping the unflipped sample on all axes
    np.testing.assert_allclose(
        np.asarray(o1["signal"])[..., 0],
        np.flip(np.asarray(o0["signal"])[..., 0], axis=(1, 2, 3)),
        rtol=1e-6,
    )


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
    sample = make_device_sampler(b, 2, (8, 16, 16))
    key = jax.random.PRNGKey(0)
    for i in range(3):
        key, sub = jax.random.split(key)
        state, m = step(state, sample(sub))
    assert np.isfinite(float(m["loss"]))


def test_nonuniform_shapes_rejected():
    from repmode_tpu.data.store import VolumeRecord, VolumeStore

    recs = [
        VolumeRecord(np.zeros((8, 16, 16), np.float32), np.zeros((8, 16, 16), np.float32), "a", 0, {}),
        VolumeRecord(np.zeros((8, 18, 16), np.float32), np.zeros((8, 18, 16), np.float32), "a", 0, {}),
    ]
    with pytest.raises(ValueError):
        DeviceVolumeBank.from_store(VolumeStore(recs, ("a",)))
