import jax, jax.numpy as jnp, numpy as np, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TN, TM, D = 256, 512, 128
Np, Mp = 2048, 2048
a = jnp.ones((Np, D), jnp.bfloat16)
bt = jnp.ones((D, Mp), jnp.bfloat16)

def run(name, kernel):
    try:
        r = pl.pallas_call(kernel,
            grid=(Np//TN, Mp//TM),
            in_specs=[
                pl.BlockSpec((TN, D), lambda i,j:(i,0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, TM), lambda i,j:(0,j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TN,1), lambda i,j:(i,0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Np,1), jnp.float32),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel","arbitrary")),
        )(a, bt)
        print(name, "OK", np.asarray(r)[0,0])
    except Exception as e:
        print(name, "FAIL", str(e).split("\n")[0][:90])

def k1(ar, btr, orf):
    ab = jax.lax.dot_general(ar[:], btr[:], (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    orf[:] = jnp.min(ab, axis=1, keepdims=True)
run("grid bf16 dot", k1)

def k2(ar, btr, orf):
    j = pl.program_id(1)
    ab = jax.lax.dot_general(ar[:], btr[:], (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    tb = jnp.min(ab, axis=1, keepdims=True)
    @pl.when(j == 0)
    def _(): orf[:] = tb
    @pl.when(j > 0)
    def _(): orf[:] = jnp.minimum(orf[:], tb)
run("grid+when merge", k2)
