from tpupose.detectors.crops import (
    compute_limbs_length,
    compute_unit_length,
    crop_around_keypoint,
    crop_face,
    crop_face_haar,
    crop_hands,
    crop_image,
    crop_person,
    get_unit_length,
)
from tpupose.detectors.draw import (
    draw_face_keypoints,
    draw_hand_keypoints,
    draw_person_pose,
)
from tpupose.detectors.bucketed import (
    BucketedPoseDetector,
    best_canvas,
    canvas_palette,
)
from tpupose.detectors.face import FaceDetector
from tpupose.detectors.hand import HandDetector
from tpupose.detectors.pose import PoseDetector
