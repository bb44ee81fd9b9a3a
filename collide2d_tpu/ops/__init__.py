"""Device-side geometry + collision primitives (jnp + Pallas)."""
