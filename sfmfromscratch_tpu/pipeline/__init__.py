from sfmfromscratch_tpu.pipeline.frontend import extract_features, FeatureRunner


def __getattr__(name):
    # Lazy: the engines pull in the full geometry/BA stack.
    if name == "SfmEngine":
        from sfmfromscratch_tpu.pipeline.incremental import SfmEngine
        return SfmEngine
    if name == "GlobalSfmEngine":
        from sfmfromscratch_tpu.pipeline.global_sfm import GlobalSfmEngine
        return GlobalSfmEngine
    raise AttributeError(name)
