"""Two-process CPU dryrun of the multi-host (DCN) path.

Simulates the SURVEY §2.4/§5 deployment layout — utterance batch
sharded over HOSTS (DCN), frequency bins sharded over the devices
within each host (ICI) — with two local processes of 4 virtual CPU
devices each, coordinated over local TCP by ``jax.distributed``:

    mesh ('b', 'f') = (2 processes, 4 devices/process)

Each process contributes its own utterances via
``parallel.shard_batch_from_process_local``; the fit is the unchanged
``CACGMMTrainer`` program with frequency-constant weights, whose
per-iteration weight reduction is the one collective crossing 'f'
(the 'b' axis is pure data parallelism — nothing crosses hosts per
iteration, which is exactly why 'b' is the DCN axis).

Run with no arguments: spawns the two workers and reports
``DCN DRYRUN OK`` on success. Exercised by
tests/test_parallel/test_distributed.py.
"""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_PROC = 2
LOCAL_DEVICES = 4


def worker(port, pid):
    sys.path.insert(0, REPO)
    import jax

    from pb_bss_tpu.parallel import (
        initialize_distributed,
        make_mesh,
        shard_batch_from_process_local,
    )

    initialize_distributed(
        f'127.0.0.1:{port}', N_PROC, pid,
        local_device_count=LOCAL_DEVICES, platform='cpu')
    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.device_count() == N_PROC * LOCAL_DEVICES, \
        jax.device_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from pb_bss_tpu.models.cacgmm import CACGMMTrainer

    mesh = make_mesh((N_PROC, LOCAL_DEVICES), ('b', 'f'))

    # one utterance per "host", frequency bins sharded within
    B_local, F, T, D, K = 1, 16, 24, 3, 2
    rng = np.random.default_rng(7 + jax.process_index())
    y_local = (rng.standard_normal((B_local, F, T, D))
               + 1j * rng.standard_normal((B_local, F, T, D))
               ).astype(np.complex64)
    y = shard_batch_from_process_local(y_local, mesh)
    assert y.shape == (N_PROC * B_local, F, T, D), y.shape

    model = CACGMMTrainer().fit(
        y, num_classes=K, iterations=2,
        weight_constant_axis=(-3, -1),   # the cross-'f' psum mode
        use_fused_em=False)
    affiliation = model.predict(y)
    ok = (jnp.isfinite(model.cacg.covariance_eigenvalues).all()
          & jnp.isfinite(model.weight).all()
          & jnp.isfinite(affiliation).all()
          & jnp.all(jnp.abs(jnp.sum(affiliation, axis=-2) - 1) < 1e-3))
    all_ok = np.asarray(multihost_utils.process_allgather(
        jnp.reshape(ok, (1,)), tiled=True))
    assert model.weight.shape == (N_PROC * B_local, 1, K, 1), \
        model.weight.shape
    if jax.process_index() == 0:
        assert all_ok.all(), all_ok
        print('worker check: global devices', jax.device_count(),
              'weight shape', model.weight.shape, flush=True)
    jax.distributed.shutdown()


def main():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    for var in ('XLA_FLAGS', 'JAX_PLATFORMS', 'PYTHONPATH',
                'JAX_NUM_CPU_DEVICES'):
        env.pop(var, None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             '--worker', str(port), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(N_PROC)
    ]
    outs = []
    rc = 0
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = 1
        outs.append(out.decode(errors='replace'))
        rc |= p.returncode if p.returncode is not None else 1
    if rc == 0:
        print(outs[0].strip())
        print('DCN DRYRUN OK')
    else:
        for i, out in enumerate(outs):
            print(f'--- worker {i} ---\n{out}')
        print('DCN DRYRUN FAILED')
    sys.exit(rc)


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == '--worker':
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
