"""REAL multi-process test of nd_tpu.parallel.distributed.

The reference's multi-node story is the filesystem; ours is
jax.distributed over DCN. Everything else in the suite simulates
multi-device on one process — this test actually spawns two OS
processes (2 local CPU devices each), coordinates them over a
localhost port exactly like a pod slice's DCN, and runs the
load-local-slices -> assemble-global-cube -> cross-process-reduction
flow end to end (see tests/_dist_worker.py).
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      '_dist_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_assembly_and_reduction():
    port = str(_free_port())
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), '2', port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, 'worker %d failed:\n%s' % (i, out)
        assert 'WORKER_OK %d' % i in out, out
    # both workers computed the same global reduction
    vals = {line.split()[2] for out in outs
            for line in out.splitlines() if line.startswith('WORKER_OK')}
    assert len(vals) == 1, vals
