from torchdriveenv_tpu.maps.arrays import (  # noqa: F401
    Assets,
    BackgroundArrays,
    MapArrays,
    SuiteArrays,
    load_assets,
    sample_dir_angle,
    sample_sdf,
)
