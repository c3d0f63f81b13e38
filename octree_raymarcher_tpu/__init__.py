"""TPU-native differentiable sparse-voxel-octree raymarcher (JAX/Pallas).

A from-scratch framework with the capabilities of the reference C++/OpenGL
engine jfjell/Octree-Raymarcher, re-architected for TPU: octrees live in
HBM-resident pooled arenas, rays march in lockstep vector loops, worlds are
generated level-synchronously, edits are functional arena updates, and images
shard across device meshes with gradients reduced over ICI.
"""

__version__ = "0.1.0"
