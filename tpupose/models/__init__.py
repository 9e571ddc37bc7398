from tpupose.models.posenet import CocoPoseNet
from tpupose.models.facenet import FaceNet
from tpupose.models.handnet import HandNet

# Architecture registry (ref ``entity.py:50-54``).
ARCHS = {
    "posenet": CocoPoseNet,
    "facenet": FaceNet,
    "handnet": HandNet,
}
