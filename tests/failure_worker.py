"""Worker for the cross-process failure-detection test — NOT collected by
pytest (tests/test_multihost.py spawns it).

Both workers join a 2-process jax.distributed cluster. Worker 1 then EXITS
without ever participating in a collective (the dead peer). Worker 0 runs
`heartbeat`, whose cross-process probe must NOT complete — either the
collective hangs until the deadline or the distributed runtime errors —
and must surface as FailureDetected. Prints 'DETECTED_OK' on worker 0.

Usage: failure_worker.py <process_id> <port>
"""

import os
import sys


def main():
    proc_id, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    jax.config.update("jax_platforms", "cpu")

    from nx_signal_tpu.parallel import multihost
    from nx_signal_tpu.parallel.failure import FailureDetected, heartbeat

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=proc_id,
    )
    assert jax.process_count() == 2

    if proc_id == 1:
        # the dead peer: leave without joining any collective
        print("PEER_EXITING", flush=True)
        os._exit(0)

    try:
        heartbeat(timeout=20.0)
    except FailureDetected as e:
        print(f"DETECTED_OK {type(e).__name__}: {e}", flush=True)
        # the probe thread may still be wedged in the dead collective —
        # exit hard, as a supervised job would to trigger its restart
        os._exit(0)
    print("HEARTBEAT_UNEXPECTEDLY_PASSED", flush=True)
    os._exit(1)


if __name__ == "__main__":
    main()
