from sfmfromscratch_tpu.viz.scatter3d import V3D
