"""Multi-chip / multi-host parallelism.

Green-field design — the reference is single-node (SURVEY.md section 2.8/5.8).
Rays and image tiles are data-parallel over a jax.sharding Mesh; the film is
tile-sharded (no communication on the forward path), and scene-parameter
gradients are reduced with psum inserted by XLA from sharding annotations.
"""

from .mesh import make_mesh, shard_pixels  # noqa: F401
from .train import render_loss_and_grad, training_step  # noqa: F401
