"""Pure-numpy geometry kernels (no Spark imports).

These are the vectorized cores that run inside Arrow/pandas UDFs.
Bit-exact replicas of the reference semantics:
  - fixed-point coordinates (int32, degrees x 1e7)
  - northward ray-cast point-in-polygon (osmconvert.c:2039-2133)
  - multi-polygon region/subregion assignment (osmassignpoly.c:1614-1783)
  - coarse spatial cell keys (osmgeobase.c:2547-2560)
"""
