"""Block until the axon TPU backend answers a trivial op (or exit 1 after
--max-wait). Run BEFORE every TPU probe so backend outages don't burn
retry attempts (outage observed 2026-08-18 ~23:45-?: every device op hangs
~25 min then dies UNAVAILABLE)."""
import subprocess, sys, time

MAX_WAIT = int(sys.argv[1]) if len(sys.argv) > 1 else 21600
CHECK = ("import jax, jax.numpy as jnp; "
         "(jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready(); print('TPU_UP')")
t0 = time.time()
while time.time() - t0 < MAX_WAIT:
    try:
        r = subprocess.run([sys.executable, "-c", CHECK], capture_output=True,
                           text=True, timeout=120)
        if "TPU_UP" in r.stdout:
            print(f"tpu healthy after {time.time()-t0:.0f}s", flush=True)
            sys.exit(0)
    except subprocess.TimeoutExpired:
        pass
    print(f"tpu still down at +{time.time()-t0:.0f}s; sleeping 120s", flush=True)
    time.sleep(120)
sys.exit(1)
