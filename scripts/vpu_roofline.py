"""Measure the practical VPU op-mix ceiling for the fused EM kernels
(VERDICT r4 #4: substantiate — or refute — the 'tens of percent'
practical-MFU ceiling with a microbenchmark).

Four single-kernel Pallas microbenchmarks on VMEM-resident f32
planes, each with independent accumulator chains (throughput, not
latency; the chain count is swept for 'fma' to show the plateau —
within a chain every rep is dependent, but one rep over a (512, 512)
plane is already 256 independent vector registers of work, so the
sweep separates genuine VMEM/ALU throughput from dependency stalls):

  fma   — a*x+b fused multiply-add            (2 FLOP/elem/rep)
  exp   — exp(small*acc)                      (1 transcendental/rep)
  recip — 1/(acc+c)                           (1 divide/rep)
  mix   — the EM inner-loop blend: per rep 12 FMA + 1 exp + 1 log
          + 1 recip + 2 max (the measured op ratio of one fused EM
          iteration per element of the (K, T, F') posterior plane —
          see bench.py:em_flops_per_iteration)

Timing uses the honest tunnel protocol (distinct pre-staged inputs,
derived-scalar fetch; CLAUDE.md gotchas 3/12).

Run from /root/repo on the axon backend:
    python scripts/vpu_roofline.py
"""
import functools
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

S, L = 512, 512            # (sublane, lane) plane: 1 MB f32
CHAINS = 4
REPS = 2000


def _bench_kernel(x_ref, o_ref, *, reps, op, chains=CHAINS):
    # VMEM stack budget: chains live (s, L) f32 planes + in/out
    # blocks must fit the 16 MB scoped limit — the caller shrinks the
    # sublane dim as the chain count grows.
    accs = [x_ref[...] * (0.5 + 0.1 * i) for i in range(chains)]
    x = x_ref[...]

    def body(i, accs):
        out = []
        for a in accs:
            if op == 'fma':
                a = a * x + 1e-6
            elif op == 'exp':
                a = jnp.exp(-1e-6 * a)
            elif op == 'recip':
                a = 1.0 / (a + 1.5)
            elif op == 'fma12':
                # register-resident FMA chain: 12 arithmetic ops per
                # loaded element — measures the ALU rate with VMEM
                # traffic amortized (the regime the fused EM kernel
                # operates in: ~520 FLOPs per loaded posterior elem)
                for _ in range(12):
                    a = a * x + 1e-6
            elif op == 'mix':
                # per rep: 12 FMA-class + exp + log + recip + 2 max
                for _ in range(6):
                    a = a * x + 1e-6      # 6 x FMA
                q = jnp.maximum(a * a + 1e-9, 1e-30)   # FMA + max
                lg = jnp.log(q)
                e = jnp.exp(-1e-6 * lg)
                a = jnp.maximum(a + e * x, 1e-30) \
                    + 1.0 / (q + 1.5)     # 2 FMA-ish + max + recip
                for _ in range(3):
                    a = a * x + 1e-6      # 3 x FMA
            out.append(a)
        return out

    accs = lax.fori_loop(0, reps, body, accs)
    acc = accs[0]
    for a in accs[1:]:
        acc = acc + a
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=('reps', 'op', 'chains'))
def run_bench(x, *, reps, op, chains=CHAINS):
    out = pl.pallas_call(
        functools.partial(_bench_kernel, reps=reps, op=op,
                          chains=chains),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
    )(x)
    return jnp.sum(out)


# FLOPs per element per rep per chain (count transcendentals/divides
# as 1 "op" — the point is ops/s per class, FLOP-equivalents shown
# separately)
OP_COUNTS = {
    'fma': 2.0,            # mul + add
    'fma12': 24.0,         # 12 chained FMAs per loaded element
    'exp': 1.0,
    'recip': 1.0,
    'mix': 12 * 2 + 1 + 1 + 1 + 2 + 3,   # 12 FMA=24fl + exp/log/recip
}


def main():
    fetch = jax.jit(lambda v: v + 0.0)
    print('backend:', jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(fetch(jnp.float32(1.0)))
    print(f'probe ok in {time.time() - t0:.1f}s', flush=True)
    w = jax.jit(lambda a: lax.scan(
        lambda c, _: (c @ a, None), jnp.eye(8), None, length=4)[0])
    np.asarray(fetch(w(jnp.eye(8) * 0.5).sum()))
    print(f'warmup done {time.time() - t0:.1f}s', flush=True)

    rng = np.random.default_rng(0)
    n_calls = 8
    results = {}

    def measure(op, chains):
        # constant TOTAL work: plane shrinks as chains grow (also
        # keeps chains x plane under the 16 MB scoped-VMEM stack)
        s = (S * CHAINS) // chains
        inputs = [jnp.asarray(
            (0.99 + 0.001 * rng.standard_normal((s, L))).astype(
                np.float32)) for _ in range(n_calls)]
        _ = np.asarray(fetch(sum(x.sum() for x in inputs)))
        _ = np.asarray(fetch(
            run_bench(inputs[0], reps=REPS, op=op, chains=chains)))
        start = time.perf_counter()
        acc = sum(run_bench(x, reps=REPS, op=op, chains=chains)
                  for x in inputs)
        _ = np.asarray(fetch(acc))
        dt = (time.perf_counter() - start) / n_calls
        elems = s * L * chains * REPS
        ops = elems * OP_COUNTS[op]
        print(f'{op:6s} x{chains:<2d} ({s}x{L}): '
              f'{dt * 1e3:7.2f} ms/call -> '
              f'{ops / dt / 1e12:6.2f} Tops/s '
              f'({elems / dt / 1e12:.2f} Telem-rep/s)', flush=True)
        return ops / dt

    # dependency-vs-throughput: sweep the chain count for fma
    for chains in (2, 4, 8):
        measure('fma', chains)
    for op in ('fma', 'fma12', 'exp', 'recip', 'mix'):
        results[op] = measure(op, CHAINS)

    # One fused EM iteration spends ~520 FLOPs per (K, T, F')
    # posterior element (bench.py:em_flops_per_iteration / F*K*T —
    # the D^2-scaled projection + scatter dominate) against ONE
    # exp/log/recip set, so its ceiling is essentially the
    # register-resident FMA rate ('fma12'), not the 24:1 'mix' rate.
    print(f"\nmeasured rates: elementwise-VMEM-bound "
          f"{results['fma'] / 1e12:.2f} TFLOP/s, register-resident "
          f"FMA {results['fma12'] / 1e12:.2f} TFLOP/s (the EM-kernel "
          f"ceiling), 24FLOP:1-transcendental blend "
          f"{results['mix'] / 1e12:.2f} TFLOP-equiv/s",
          flush=True)

    # ---- platform ceilings: effective HBM + MXU ------------------
    # (batched-in-one-program protocol; distinct inputs per rep)
    nb = 8
    NN = 4096

    @jax.jit
    def redsum2(x1, x2):
        return (sum(jnp.sum(x) for x in x1)
                + sum(jnp.sum(x) for x in x2))
    mk_set = lambda: tuple(jnp.asarray(rng.standard_normal(
        (NN, NN)).astype(np.float32)) for _ in range(nb))
    xs1, xs2, xs3 = mk_set(), mk_set(), mk_set()
    _ = np.asarray(fetch(sum(x.sum() for x in xs1)
                         + sum(x.sum() for x in xs2)
                         + sum(x.sum() for x in xs3)))
    np.asarray(fetch(redsum2(xs2, xs3) + 0.0))   # compile+warm
    start = time.perf_counter()
    _ = np.asarray(fetch(redsum2(xs1, xs2) + 0.0))
    dt = (time.perf_counter() - start) / (2 * nb)
    print(f'effective HBM (64 MB read-reduce): '
          f'{NN * NN * 4 / dt / 1e9:.0f} GB/s', flush=True)

    NM, rm = 8192, 2
    for prec, label in ((None, 'bf16-default'), ('float32', 'f32')):
        @jax.jit
        def mmsum(pairs, prec=prec):
            if prec:
                with jax.default_matmul_precision(prec):
                    return sum(jnp.sum(a @ b) for a, b in pairs)
            return sum(jnp.sum(a @ b) for a, b in pairs)
        mk_pairs = lambda: tuple(
            (jnp.asarray(rng.standard_normal(
                (NM, NM)).astype(np.float32)),
             jnp.asarray(rng.standard_normal(
                 (NM, NM)).astype(np.float32)))
            for _ in range(rm))
        p1, p2 = mk_pairs(), mk_pairs()
        _ = np.asarray(fetch(sum(a.sum() + b.sum() for a, b in p1)
                             + sum(a.sum() + b.sum() for a, b in p2)))
        np.asarray(fetch(mmsum(p1) + 0.0))
        start = time.perf_counter()
        acc = mmsum(p2)
        _ = np.asarray(fetch(acc + 0.0))
        dt = (time.perf_counter() - start) / rm
        print(f'matmul {NM}^3 {label}: '
              f'{2 * NM ** 3 / dt / 1e12:.1f} TFLOP/s', flush=True)


if __name__ == '__main__':
    main()
