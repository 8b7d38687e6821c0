"""Per-phase wall decomposition of the SumGAN 3-phase step (VERDICT r4
item 6: find the stall — dLSTM decode, discriminator re-forwards, or
optimizer traffic — before optimizing).

Builds the tvsum-scale group-20 engine exactly like bench.py::bench_sumgan,
then times, separately and steady-state:

  - step_se / step_d / step_c        (the three jitted phase programs)
  - their loss FORWARDS only         (no grad, no optimizer)
  - summarizer_forward_pair alone    (sLSTM + batched 2x VAE decode)
  - discriminate_many k=3 alone      (batched cLSTM)

The difference (phase step) - (loss forward) isolates backward+optimizer;
(loss fwd) - (component walls) isolates glue.  Run on the attached TPU:

    python scripts/profile_gan_phases.py [--int8] [--bs 20] [--trace DIR]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--bs", type=int, default=20)
    ap.add_argument("--trace", default=None,
                    help="jax.profiler trace dir (optional)")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from summarizer_tpu.data.batching import pack_train
    from summarizer_tpu.data.hdf5 import SummarizerDataset
    from summarizer_tpu.models import sumgan as sg
    from summarizer_tpu.train.loop import make_engine
    from summarizer_tpu.utils.config import HParameters

    hps = HParameters().load_from_args({
        "model": "sumgan",
        "splits_files": ["splits/tvsum_splits.json"],
        "epochs": 2,
        "log_level": "error",
        "tensorboard": False,
        "log_dir": "logs/profile_gan",
        "extra_params": {"pretrain_vae": 0, "batch_size": args.bs, "bf16": 1,
                         "split_phases": 1, "int8": int(args.int8)},
    })
    sf = hps.splits_files[0]
    dataset = SummarizerDataset(hps.dataset_of_file[sf])
    engine = make_engine(hps, dataset, hps.dataset_name_of_file[sf])
    split = hps.splits_of_file[sf][0]
    keys = list(split["train_keys"])[: args.bs]

    pack = pack_train(engine.dataset.subset(keys), t_max=engine.t_max)
    x = jax.device_put(jnp.asarray(pack.features))
    y = jax.device_put(jnp.asarray(pack.targets))
    m = jax.device_put(jnp.asarray(pack.mask))

    cfg = engine._cfg()
    params = engine.init_params(jax.random.PRNGKey(1))
    opts, opt_states = engine.make_optimizers(params, cfg)
    rng = jax.random.PRNGKey(0)

    def timeit(name, fn, *a, reps=args.reps, **kw):
        out = fn(*a, **kw)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a, **kw)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:<42} {dt * 1e3:9.1f} ms")
        return dt

    with engine.compute_policy():
        loss_se, loss_d, loss_c = engine.phase_losses(cfg)
        import jax as _jax

        k1, k2, k3 = _jax.random.split(rng, 3)

        def discriminate3(p):
            outs = sg.discriminate_many(p, [x, x, x], m)
            return outs[0][0]

        # Forward-only probes (jitted).
        f_se = _jax.jit(lambda p, k: loss_se(p, x, y, m, k))
        f_d = _jax.jit(lambda p, k: loss_d(p, x, m, k))
        f_c = _jax.jit(lambda p, k: loss_c(p, x, m, k, 0.1))
        f_pair = _jax.jit(
            lambda p, k: sg.summarizer_forward_pair(p, x, m, k)[0])
        f_disc3 = _jax.jit(discriminate3)

        total = 0.0
        total += timeit("loss_se forward", f_se, params, k1)
        total += timeit("loss_d forward", f_d, params, k2)
        total += timeit("loss_c forward", f_c, params, k3)
        print(f"{'sum of loss forwards':<42} {total * 1e3:9.1f} ms")
        timeit("summarizer_forward_pair (sLSTM+2xVAE)", f_pair, params, k1)
        timeit("discriminate_many k=3 (batched cLSTM)", f_disc3, params)

        # Full grad steps per phase.
        g_se = _jax.jit(_jax.value_and_grad(
            lambda p: loss_se(p, x, y, m, k1)))
        g_d = _jax.jit(_jax.value_and_grad(lambda p: loss_d(p, x, m, k2)))
        g_c = _jax.jit(_jax.value_and_grad(
            lambda p: loss_c(p, x, m, k3, 0.1), has_aux=True))
        t_se = timeit("loss_se value_and_grad", g_se, params)
        t_d = timeit("loss_d value_and_grad", g_d, params)
        t_c = timeit("loss_c value_and_grad", g_c, params)
        step_total = t_se + t_d + t_c
        vps = args.bs / step_total
        print(f"\n3-phase grad total {step_total * 1e3:.1f} ms -> "
              f"{vps:.2f} videos/s upper bound (no optimizer/dispatch)")

        if args.trace:
            import jax.profiler

            with jax.profiler.trace(args.trace):
                for _ in range(3):
                    g_se(params)
                    g_d(params)
                    out = g_c(params)
                jax.block_until_ready(out)
            print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
