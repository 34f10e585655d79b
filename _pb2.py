import time
import jax, numpy as np
from repmode_tpu.config import Config, EvalConfig, TrainConfig
from repmode_tpu.infer.predict import TiledPredictor
from repmode_tpu.models.reparam import make_inference
from repmode_tpu.train.state import create_train_state

rng = np.random.default_rng(0)
vol = rng.standard_normal((32, 624, 924)).astype(np.float32)
cfg = Config(train=TrainConfig(batch_size_eval=16, compute_dtype='bfloat16'),
             eval=EvalConfig(pallas_conv=True))
state = create_train_state(cfg, jax.random.PRNGKey(0))
prepare, _ = make_inference(cfg)
plain = prepare(state.variables, 0)
pred = TiledPredictor(cfg)
out = pred(plain, vol); _ = float(out[0,0,0])
times = []
for _i in range(4):
    t0 = time.perf_counter()
    out = pred(plain, out); _ = float(out[0,0,0])
    times.append(time.perf_counter()-t0)
dt = sorted(times)[2]
print(f'pallas fused epilogue: {dt:.2f} s/vol = {32*624*924/dt/1e6:.2f} Mvox/s', flush=True)
