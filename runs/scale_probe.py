"""Scale probes on TPU:
1. ETL + data-pipeline at 5M ratings (6.4x the committed corpus).
2. Train-step time at the reference-DEFAULT encoder size (hidden 384,
   3 layers, 12 heads — models.py defaults) vs the trained tiny config.
"""
import json, pathlib, shutil, time
import numpy as np

BASE = pathlib.Path("/tmp/scale5m")

def etl():
    from xfmr_rec_tpu.data.synthetic import generate_movielens
    from xfmr_rec_tpu.data.prepare import prepare_movielens
    if BASE.exists():
        shutil.rmtree(BASE)
    t0 = time.perf_counter()
    generate_movielens(BASE, num_users=24_000, num_movies=16_000,
                       num_ratings=5_000_000, seed=0)
    t_gen = time.perf_counter() - t0
    t0 = time.perf_counter()
    prepare_movielens(str(BASE), overwrite=True)
    t_etl = time.perf_counter() - t0
    print(f"5M-rating synthetic: generate {t_gen:.0f}s, ETL {t_etl:.0f}s", flush=True)

def pipeline():
    from xfmr_rec_tpu.data.module import DataConfig, RecDataModule
    t0 = time.perf_counter()
    dm = RecDataModule(DataConfig(data_dir=str(BASE), batch_size=256))
    dm.prepare_data(); dm.setup()
    print(f"tokenize-once setup: {time.perf_counter()-t0:.0f}s "
          f"(steps/epoch {dm.steps_per_epoch}, max_pos {dm.max_positives}, "
          f"max_tgt {dm.max_targets})", flush=True)
    it = dm.train_batches()
    t0 = time.perf_counter()
    n = 50
    for i, b in zip(range(n), it):
        pass
    print(f"host batch assembly: {(time.perf_counter()-t0)/n*1e3:.2f} ms/batch(256)", flush=True)

def step_time():
    import jax, jax.numpy as jnp
    from xfmr_rec_tpu.training.module import (
        TrainConfig, create_train_state, make_train_step)
    for name, cfg in (
        ("trained tiny (32/1/4)", TrainConfig(max_length=64)),
        ("reference default (384/3/12)", TrainConfig(
            hidden_size=384, num_hidden_layers=3, num_attention_heads=12,
            intermediate_size=1536, max_length=64)),
    ):
        _, state = create_train_state(cfg, rng=0)
        step = jax.jit(make_train_step(cfg))
        rng = np.random.default_rng(0)
        B = 256
        batch = {
            "user_tokens": rng.integers(1, cfg.vocab_size, (B, 64)).astype(np.int32),
            "item_tokens": rng.integers(1, cfg.vocab_size, (B, 64)).astype(np.int32),
            "neg_item_tokens": rng.integers(1, cfg.vocab_size, (B, 64)).astype(np.int32),
            "target": rng.integers(1, 6, B).astype(np.float32),
            "item_idx": rng.integers(1, 100000, 2 * B).astype(np.int64),
            "pos_idx": rng.integers(0, 100000, (B, 64)).astype(np.int64),
            "log_q": rng.normal(size=2 * B).astype(np.float32),
        }
        batch = {k: jax.device_put(v) for k, v in batch.items()}
        state, m = step(state, batch)
        jax.block_until_ready(m)
        t0 = time.perf_counter(); IT = 30
        for _ in range(IT):
            state, m = step(state, batch)
        float(jnp.sum(m["train/PairwiseHingeLoss"]))
        dt = (time.perf_counter() - t0) / IT
        print(f"train step {name} B=256 L=64: {dt*1e3:.2f} ms "
              f"({256/dt:,.0f} ex/s)", flush=True)

etl(); pipeline(); step_time()
