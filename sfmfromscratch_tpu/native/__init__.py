from sfmfromscratch_tpu.native.bindings import (
    native_available,
    resize_gray,
    build_tracks,
)
