"""gvpm_tpu — TPU-native gradient-domain volumetric photon density estimation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
gradientpm/gvpm (SIGGRAPH 2018): batched light/camera path tracing through
participating media, photon-density estimators (points, BRE, beams, planes)
in the primal and gradient domains, and screened-Poisson image
reconstruction — built for TPU device meshes instead of a CPU thread
scheduler (reference: /root/reference, see SURVEY.md).
"""

__version__ = "0.1.0"
