import sys
import jax, jax.numpy as jnp
import numpy as np
from pvcnn_tpu.ops.pallas import conv_rows as cr

B, R, C = 32, 16, 64
ch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
base = cr.conv_rows_plan(B, R, C, C, 3, jnp.float32)
forced = (base[0], base[1], ch, base[3], base[4], base[5])
print("forced plan:", forced)
orig = cr.conv_rows_plan
cr.conv_rows_plan = lambda *a, **k: forced if orig(*a, **k) else None

x = jnp.asarray(np.random.RandomState(0).randn(B, C, R**3), jnp.float32)
k = jnp.asarray(np.random.RandomState(1).randn(3,3,3,C,C)*0.05, jnp.float32)
bias = jnp.zeros((C,), jnp.float32)
ps = jnp.ones((C,), jnp.float32)
sh = jnp.zeros((C,), jnp.float32)

def loss(x, k, bias, ps, sh):
    y, s1, s2 = cr.conv3d_rows_act(x, k, bias, ps, sh, R, True, True)
    return jnp.sum(y * y) * 1e-6 + jnp.sum(s1) * 1e-7 + jnp.sum(s2) * 1e-9

f = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
out = f(x, k, bias, ps, sh)
print("ok", [float(jnp.sum(jnp.abs(o))) for o in out])
