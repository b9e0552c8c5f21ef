import time, jax
t0=time.perf_counter()
from nextsim_tpu.config import Config
from nextsim_tpu.model.simulator import Simulator
print("import", time.perf_counter()-t0, flush=True)
for nx in (128,):
    cfg = Config(overrides={
        "grid.preset":"arctic","grid.nx":nx,"grid.ny":nx,"grid.resolution":10e3,
        "simul.timestep":200,"simul.time_init":"2015-10-16 00:00:00",
        "dynamics.substeps":120,"thermo.use_thermo_forcing":False,
        "setup.ice-type":"constant","setup.atmosphere-type":"constant","setup.ocean-type":"constant",
        "ideal_simul.constant_wind_u":10.0,"tpu.donate_state":False})
    t0=time.perf_counter(); sim=Simulator(cfg); print("init", time.perf_counter()-t0, flush=True)
    f=sim.forcing_provider(sim.current_time, sim.time_init)
    t0=time.perf_counter(); out=sim._step_fn(sim.state,f); jax.block_until_ready(out[0]); print(nx,"compile+first", time.perf_counter()-t0, flush=True)
    t0=time.perf_counter()
    s=out[0]
    for _ in range(5): s,d,v=sim._step_fn(s,f)
    jax.block_until_ready(s); print(nx,"5 steps", time.perf_counter()-t0, flush=True)
