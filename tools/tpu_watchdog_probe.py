import sys
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print("probe ok:", float((x @ x).sum()))
