"""Compiled (non-interpret) shard_map + HexSlabHalo + fused Mosaic
kernels on the real TPU chip: a 1-device mesh exercises the full
sharded program path (ppermute self-exchange included) with the
production kernels COMPILED, closing the 'dryrun is interpret-only'
honesty gap (VERDICT r2 weakness 7) as far as one chip allows."""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_ENABLE_X64", "0")
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
from esdg_cns_tpu.presets import euler_hex_3d, lid_driven_cavity_3d
from esdg_cns_tpu.solvers.euler_fused import make_euler_rhs_fused
from esdg_cns_tpu.solvers import make_cns_rhs_affine
from esdg_cns_tpu.parallel import make_sharded_euler_rhs_fused
from esdg_cns_tpu.parallel.sharding import make_sharded_cns_rhs_affine

mesh = Mesh(np.array(jax.devices()[:1]), ("e",))

disc, q0 = euler_hex_3d(n=3, k1d=8, dtype=jnp.float32)
ref, _ = jax.jit(make_euler_rhs_fused(disc, dissipation=True))(q0)
got, _ = jax.jit(make_sharded_euler_rhs_fused(mesh, disc,
                                              dissipation=True))(q0)
err = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
print(f"euler fused shard_map COMPILED on TPU: rel err {err:.2e}")
assert err < 1e-5

disc3, q3, bc3, p3 = lid_driven_cavity_3d(n=3, k1d=4, dtype=jnp.float32)
kw = dict(mu=p3["mu"], pr=p3["pr"], re=p3["re"], bc=bc3,
          inviscid_dissipation=True, viscous_dissipation=True,
          volume_impl="fused_hex")
ref3, _ = jax.jit(make_cns_rhs_affine(disc3, **kw))(q3)
got3, _ = jax.jit(make_sharded_cns_rhs_affine(mesh, disc3, **kw))(q3)
err3 = float(jnp.abs(got3 - ref3).max() / jnp.abs(ref3).max())
print(f"cns fused_hex shard_map COMPILED on TPU: rel err {err3:.2e}")
assert err3 < 1e-5
print("OK")
