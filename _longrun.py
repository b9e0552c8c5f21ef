# 10-model-day pan-Arctic BBM+Winton run on the real TPU: stability + wall time
import time, jax, numpy as np
from nextsim_tpu.config import Config
from nextsim_tpu.model.simulator import Simulator

cfg = Config(overrides={
    "grid.preset": "arctic", "grid.nx": 608, "grid.ny": 608, "grid.resolution": 10e3,
    "simul.timestep": 200, "simul.time_init": "2015-10-16 00:00:00",
    "simul.duration": 10.0,
    "dynamics.substeps": 120, "dynamics.alea_factor": 0.33,
    "dynamics.use_coriolis": True,
    "thermo.use_thermo_forcing": True, "setup.thermo-type": "winton",
    "setup.ice-type": "constant", "setup.atmosphere-type": "constant",
    "setup.ocean-type": "constant",
    "ideal_simul.constant_wind_u": 8.0, "ideal_simul.constant_wind_v": -4.0,
    "ideal_simul.constant_tair": -15.0,
    "ideal_simul.init_SST_limit": 10.0,
    "debugging.check_fields_fast": True,
})
sim = Simulator(cfg)
# freezing-ocean start so ice persists under thermo (see verify skill note)
import jax.numpy as jnp
sim.state = sim.state.replace(
    sst=jnp.full_like(sim.state.sst, -1.8),
    tice=jnp.stack([jnp.full_like(sim.state.sst, -10.0),
                    jnp.full_like(sim.state.sst, -5.0),
                    jnp.full_like(sim.state.sst, -2.0)]))
n_steps = int(10.0 * 86400 / 200)
t0 = time.perf_counter()
for i in range(n_steps):
    sim.step()
    if (i+1) % 864 == 0:
        print(f"day {(i+1)//432*1.0:.0f}/10 ok", flush=True)
wall = time.perf_counter() - t0
s = sim.state
print(f"10-day pan-Arctic run: {n_steps} steps in {wall:.1f}s wall "
      f"({n_steps/wall:.1f} steps/s incl host loop)")
print("final: conc", float(np.asarray(s.conc).max()),
      "thick max", float(np.asarray(s.thick).max()),
      "dmg max", float(np.asarray(s.damage).max()),
      "speed max", float(np.hypot(np.asarray(s.vt_u), np.asarray(s.vt_v)).max()))
