"""Camera: matrix construction (FlyCamera equivalent) and primary-ray generation.

The reference generates primary rays straight from the inverse view/projection
matrices (RayGen.slang:35-50): NDC point -> ProjectionInverse -> normalized
camera-space target -> ViewInverse, plus a thin-lens depth-of-field offset on
the camera's right/up axes.  The host-side FlyCamera (FlyCamera.cpp:85-95)
builds the forward matrices with GLM lookAt/perspective.

We keep the exact same contract so scenes, saved cameras and DoF settings are
interchangeable with the reference.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from vpt_tpu.core import rng
from vpt_tpu.core.vecmath import normalize


def look_at(eye, center, up) -> np.ndarray:
    """GLM-style right-handed lookAt view matrix (row-major numpy, m @ v)."""
    eye = np.asarray(eye, np.float32)
    center = np.asarray(center, np.float32)
    up = np.asarray(up, np.float32)
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def perspective(fovy_rad: float, aspect: float, znear: float = 0.1, zfar: float = 1000.0) -> np.ndarray:
    """GLM-style perspective with the Vulkan Y flip the reference applies."""
    f = 1.0 / np.tan(fovy_rad / 2.0)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = -f  # Vulkan clip space: Y down
    m[2, 2] = zfar / (znear - zfar)
    m[2, 3] = -(zfar * znear) / (zfar - znear)
    m[3, 2] = -1.0
    return m


@dataclasses.dataclass
class FlyCamera:
    """WASD/mouse-style camera state; mirrors FlyCamera.{h,cpp}.

    Yaw/pitch Euler angles (degrees), GLM conventions: yaw=-90 faces -Z.
    """

    position: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    yaw: float = -90.0
    pitch: float = 0.0
    fov_deg: float = 45.0
    aspect: float = 1.0
    world_up: np.ndarray = dataclasses.field(default_factory=lambda: np.array([0, 1, 0], np.float32))

    @property
    def front(self) -> np.ndarray:
        cy, sy = np.cos(np.radians(self.yaw)), np.sin(np.radians(self.yaw))
        cp, sp = np.cos(np.radians(self.pitch)), np.sin(np.radians(self.pitch))
        f = np.array([cy * cp, sp, sy * cp], np.float32)
        return f / np.linalg.norm(f)

    def move(self, direction: str, amount: float) -> None:
        f = self.front
        r = np.cross(f, self.world_up)
        r /= np.linalg.norm(r)
        delta = {
            "forward": f, "back": -f, "right": r, "left": -r,
            "up": self.world_up, "down": -self.world_up,
        }[direction]
        self.position = (self.position + amount * delta).astype(np.float32)

    def rotate(self, dyaw: float, dpitch: float) -> None:
        self.yaw += dyaw
        self.pitch = float(np.clip(self.pitch + dpitch, -89.0, 89.0))

    def view_matrix(self) -> np.ndarray:
        return look_at(self.position, self.position + self.front, self.world_up)

    def proj_matrix(self, znear: float = 0.1, zfar: float = 1000.0) -> np.ndarray:
        return perspective(np.radians(self.fov_deg), self.aspect, znear, zfar)

    def view_inverse(self) -> np.ndarray:
        return np.linalg.inv(self.view_matrix()).astype(np.float32)

    def proj_inverse(self) -> np.ndarray:
        return np.linalg.inv(self.proj_matrix()).astype(np.float32)

    @staticmethod
    def from_matrices(view: np.ndarray, proj: np.ndarray) -> "FlyCamera":
        """Initialize from arbitrary view/proj like FlyCamera.cpp:110-140."""
        vi = np.linalg.inv(view)
        pos = vi[:3, 3]
        front = -vi[:3, 2]
        yaw = float(np.degrees(np.arctan2(front[2], front[0])))
        pitch = float(np.degrees(np.arcsin(np.clip(front[1], -1, 1))))
        fovy = 2.0 * np.arctan(1.0 / abs(proj[1, 1]))
        aspect = abs(proj[1, 1] / proj[0, 0])
        return FlyCamera(position=pos.astype(np.float32), yaw=yaw, pitch=pitch,
                         fov_deg=float(np.degrees(fovy)), aspect=aspect)


def generate_primary_rays(
    view_inverse: jnp.ndarray,
    proj_inverse: jnp.ndarray,
    pixel_xy: jnp.ndarray,  # (N, 2) float pixel coordinates (x, y)
    resolution,  # (width, height)
    rng_state: jnp.ndarray,  # (N,) uint32
    focus_distance,
    dof_strength,
):
    """Primary ray origins/directions with AA jitter + thin-lens DoF.

    Matches RayGen.slang:35-50 bit-for-bit in draw order: two uniforms for the
    AA jitter first, then two for the lens disk sample.
    """
    width, height = resolution
    rng_state, jit2 = rng.next_float2(rng_state)
    jitter = jit2 - 0.5
    pixel_center = pixel_xy + 0.5 + jitter
    uv = pixel_center / jnp.array([width, height], jnp.float32)
    d = uv * 2.0 - 1.0

    origin = jnp.broadcast_to(view_inverse[:3, 3], pixel_xy.shape[:-1] + (3,))
    target_h = (
        proj_inverse
        @ jnp.stack([d[..., 0], d[..., 1], jnp.ones_like(d[..., 0]), jnp.ones_like(d[..., 0])], axis=-1)[..., None]
    )[..., 0]
    target = normalize(target_h[..., :3])
    direction = (view_inverse[:3, :3] @ target[..., None])[..., 0]

    # Thin-lens DoF: concentric-free polar disk sample (Sampler.slang:102-112).
    focus_point = origin + direction * jnp.maximum(focus_distance, 0.001)
    rng_state, u2 = rng.next_float2(rng_state)
    theta = 2.0 * jnp.pi * u2[..., 0]
    r = jnp.sqrt(u2[..., 1])
    disk = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1) * 0.5 * dof_strength

    cam_right = view_inverse[:3, 0]
    cam_up = view_inverse[:3, 1]
    origin = origin + disk[..., 0:1] * cam_right + disk[..., 1:2] * cam_up
    direction = normalize(focus_point - origin)
    return rng_state, origin, direction
