from sfmfromscratch_tpu.io.images import load_image, save_image, fast_resize
