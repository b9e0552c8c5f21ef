# CPU f32 repro of the long-run crash at reduced size, with checkpointing
import os
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from nextsim_tpu.config import Config
from nextsim_tpu.model.simulator import Simulator
from nextsim_tpu.output.restart import write_restart

cfg = Config(overrides={
    "grid.preset": "arctic", "grid.nx": 160, "grid.ny": 160, "grid.resolution": 10e3,
    "simul.timestep": 200, "simul.time_init": "2015-10-16 00:00:00",
    "dynamics.substeps": 120, "dynamics.alea_factor": 0.33,
    "dynamics.use_coriolis": True,
    "thermo.use_thermo_forcing": True, "setup.thermo-type": "winton",
    "setup.ice-type": "constant", "setup.atmosphere-type": "constant",
    "setup.ocean-type": "constant",
    "ideal_simul.constant_wind_u": 8.0, "ideal_simul.constant_wind_v": -4.0,
    "ideal_simul.constant_tair": -15.0,
    "ideal_simul.init_SST_limit": 10.0,
    "output.exporter_path": "/tmp/crashrepro",
})
sim = Simulator(cfg)
sim.state = sim.state.replace(
    sst=jnp.full_like(sim.state.sst, -1.8),
    tice=jnp.stack([jnp.full_like(sim.state.sst, -10.0),
                    jnp.full_like(sim.state.sst, -5.0),
                    jnp.full_like(sim.state.sst, -2.0)]))
n_steps = 4320
for i in range(n_steps):
    if i % 100 == 0:
        write_restart(sim, name="ckpt")
        print(f"step {i} ok", flush=True)
    try:
        sim.step()
    except RuntimeError as e:
        print(f"CRASH at step {i}: {e}", flush=True)
        break
else:
    print("completed 10 days clean", flush=True)
