from . import host_engine, jax_engine
from .host_engine import blue_fn
