from tpupose.weights.chainer_npz import (
    commit_variables,
    load_npz_params,
    params_from_npz_auto,
    save_npz_params,
    warn_on_load_report,
)
