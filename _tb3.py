import time
import jax, jax.numpy as jnp, numpy as np
from repmode_tpu.config import Config, ModelConfig, TrainConfig
from repmode_tpu.train import create_train_state, make_train_step

rng = np.random.default_rng(0)

def run(tag, remat, bs):
    cfg = Config(
        model=ModelConfig(train_s2d=True, remat=remat),
        train=TrainConfig(batch_size=bs, patch_size=(32, 128, 128), compute_dtype='bfloat16'),
    )
    d, h, w = cfg.train.patch_size
    batch = {
        'signal': jnp.asarray(rng.standard_normal((bs, d, h, w, 1)).astype(np.float32)),
        'target': jnp.asarray(rng.standard_normal((bs, d, h, w, 1)).astype(np.float32)),
        'task': jnp.asarray(rng.integers(0, 12, bs).astype(np.int32)),
    }
    try:
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg)
        t0 = time.perf_counter()
        state, m = step(state, batch); _ = float(m['loss'])
        print(f'{tag}: compile+first {time.perf_counter()-t0:.0f}s', flush=True)
        times = []
        for _i in range(4):
            t0 = time.perf_counter()
            state, m = step(state, batch); _ = float(m['loss'])
            times.append(time.perf_counter()-t0)
        dt = sorted(times)[len(times)//2]
        vox = bs*d*h*w
        print(f'{tag}: {dt*1e3:.0f} ms/step, {vox/dt/1e6:.2f} Mvox/s', flush=True)
    except Exception as e:
        print(f'{tag}: FAILED {type(e).__name__}: {str(e)[:200]}', flush=True)

run('remat=False bs=8', False, 8)
run('remat=True  bs=16', True, 16)
