from tpupose.ops.gaussian import gaussian_blur_conv_zero, gaussian_blur_reflect
from tpupose.ops.grouping import (
    Subsets,
    group_keypoints,
    group_keypoints_numpy,
    subsets_to_poses,
)
from tpupose.ops.paf import Connections, compute_connections, greedy_match
from tpupose.ops.peaks import Peaks, find_peaks, global_argmax_keypoints
from tpupose.ops.postprocess import PoseResult, postprocess_pose
from tpupose.ops.resize import (
    compute_optimal_size,
    resize_chainer,
    resize_cv2_cubic,
    resize_cv2_linear,
    resize_hw,
)
