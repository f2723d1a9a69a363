"""Standalone jax.distributed coordinator service (no XLA client).

Lets the pinned scaling workers keep their cores to themselves: the
coordination service threads run in THIS floating process instead of inside
worker 0 (measured: in-process service cost worker 0 ~40% wall on a pinned
single core).  argv: <port> <num_processes>
"""

import sys
import time

from jax._src.lib import _jax

port, nproc = sys.argv[1], int(sys.argv[2])
service = _jax.get_distributed_runtime_service(
    f"localhost:{port}", int(nproc)
)
print("service up", flush=True)
while True:
    time.sleep(1.0)
