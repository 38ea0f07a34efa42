import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generativedensification_tpu.core import (
    Camera,
    align_cameras,
    build_covariance,
    build_rays,
    eval_sh_color,
    get_projection_matrix,
    normalize_quat,
    quat_to_rotmat,
    rsh_cart,
    trunc_exp,
)
from generativedensification_tpu.core.camera import (
    fov_to_intrinsics,
    intrinsics_to_fov,
)
from generativedensification_tpu.core.transforms import rotmat_to_quat


def _lookat_c2w(eye, target=np.zeros(3), up=np.array([0.0, 1.0, 0.0])):
    eye, target = np.asarray(eye, np.float64), np.asarray(target, np.float64)
    z = target - eye
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
    return c2w


class TestProjection:
    def test_projects_center_point_to_origin(self):
        # camera at -2z looking at origin: a point at origin projects to NDC (0,0)
        c2w = _lookat_c2w([0.0, 0.0, -2.0])
        cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, 64, 64)
        p = jnp.array([0.0, 0.0, 0.0, 1.0])
        clip = p @ cam.full_proj_transform
        ndc = clip[:3] / clip[3]
        np.testing.assert_allclose(np.asarray(ndc[:2]), [0.0, 0.0], atol=1e-6)

    def test_depth_increases_with_distance(self):
        P = get_projection_matrix(0.1, 100.0, 0.8, 0.8)
        near = jnp.array([0.0, 0.0, 1.0, 1.0]) @ P.T
        far = jnp.array([0.0, 0.0, 10.0, 1.0]) @ P.T
        assert float(near[2] / near[3]) < float(far[2] / far[3])
        # +z sign convention: w equals view-space z
        assert float(near[3]) == pytest.approx(1.0)

    def test_fov_edges_map_to_unit_ndc(self):
        fov = 0.9
        P = get_projection_matrix(0.01, 10.0, fov, fov)
        z = 3.0
        x_edge = float(np.tan(fov / 2) * z)
        clip = jnp.array([x_edge, 0.0, z, 1.0]) @ P.T
        assert float(clip[0] / clip[3]) == pytest.approx(1.0, abs=1e-6)

    def test_camera_center_convention(self):
        c2w = _lookat_c2w([0.3, -0.2, -1.7])
        cam = Camera.from_c2w(jnp.asarray(c2w), 0.8, 0.8, 32, 32)
        np.testing.assert_allclose(
            np.asarray(cam.camera_center), -c2w[:3, 3], atol=1e-6
        )

    def test_fov_intrinsics_roundtrip(self):
        ixt = fov_to_intrinsics(0.7, 0.9, 512, 384)
        fovx, fovy = intrinsics_to_fov(ixt, 512, 384)
        assert float(fovx) == pytest.approx(0.7, abs=1e-6)
        assert float(fovy) == pytest.approx(0.9, abs=1e-6)


class TestAlignCameras:
    def test_first_view_canonicalized(self):
        rng = np.random.default_rng(0)
        c2ws = np.stack(
            [_lookat_c2w(p / np.linalg.norm(p) * 1.9)
             for p in rng.normal(size=(4, 3))]
        )
        aligned, tmat = align_cameras(jnp.asarray(c2ws))
        # view 0 sits at (0, 0, -r)
        np.testing.assert_allclose(
            np.asarray(aligned[0, :3, 3]), [0, 0, -1.9], atol=5e-3
        )
        # relative geometry preserved: pairwise distances unchanged
        d_orig = np.linalg.norm(c2ws[:, :3, 3][:, None] - c2ws[:, :3, 3][None], axis=-1)
        pos = np.asarray(aligned[:, :3, 3])
        d_new = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
        np.testing.assert_allclose(d_new, d_orig, atol=5e-3)


class TestRays:
    def test_center_pixel_points_at_target(self):
        c2w = _lookat_c2w([0.0, 0.0, -2.0])[None]
        H = W = 8
        ixt = np.asarray(fov_to_intrinsics(0.8, 0.8, W, H))[None]
        rays = build_rays(jnp.asarray(c2w), jnp.asarray(ixt), H, W)
        assert rays.shape == (1, H, W, 6)
        # all origins equal the camera position
        np.testing.assert_allclose(
            np.asarray(rays[0, :, :, :3]),
            np.broadcast_to([0, 0, -2.0], (H, W, 3)),
            atol=1e-6,
        )
        # mean direction ~ optical axis (+z)
        d = np.asarray(rays[0, ..., 3:]).mean((0, 1))
        d = d / np.linalg.norm(d)
        np.testing.assert_allclose(d, [0, 0, 1], atol=1e-6)

    def test_downscaled_rays_subsample(self):
        c2w = _lookat_c2w([0.5, 0.5, -1.8])[None]
        H = W = 32
        ixt = np.asarray(fov_to_intrinsics(0.8, 0.8, W, H))[None]
        full = np.asarray(build_rays(jnp.asarray(c2w), jnp.asarray(ixt), H, W))
        down = np.asarray(build_rays(jnp.asarray(c2w), jnp.asarray(ixt), H, W, 0.25))
        assert down.shape == (1, 8, 8, 6)
        # direction is affine in pixel coords: down pixel (0,0) center maps to
        # full-res coordinate (2, 2) = midpoint of full pixels (1,1) and (2,2)
        np.testing.assert_allclose(
            down[0, 0, 0, 3:],
            (full[0, 1, 1, 3:] + full[0, 2, 2, 3:]) / 2,
            atol=1e-6,
        )


class TestSH:
    def test_degree0_constant(self):
        v = rsh_cart(jnp.array([0.0, 0.0, 1.0]), 0)
        assert v.shape == (1,)
        assert float(v[0]) == pytest.approx(0.282094791773878)

    def test_orthonormality_monte_carlo(self):
        # E_{sphere}[Y_i Y_j] = delta_ij / (4*pi)
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(200000, 3))
        pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
        Y = np.asarray(rsh_cart(jnp.asarray(pts, jnp.float32), 3))
        gram = (Y.T @ Y) / len(pts) * 4 * np.pi
        np.testing.assert_allclose(gram, np.eye(16), atol=0.06)

    def test_known_degree1_values(self):
        # torch-spherical-harmonics convention: Y index l(l+1)+m,
        # Y_1^{-1} = -c*y, Y_1^0 = c*z, Y_1^1 = -c*x  (c = 0.48860251)
        v = np.asarray(rsh_cart(jnp.array([0.3, -0.5, 0.8124]), 1))
        c = 0.48860251190292
        np.testing.assert_allclose(
            v[1:], [c * 0.5, c * 0.8124, -c * 0.3], atol=1e-6
        )

    def test_addition_theorem_all_degrees(self):
        # sum_m Y_lm(d)^2 == (2l+1)/(4*pi) for every direction d — a
        # pointwise (non-Monte-Carlo) check of the degree-0..8 recurrence
        rng = np.random.default_rng(3)
        pts = rng.normal(size=(512, 3))
        pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
        Y = np.asarray(rsh_cart(jnp.asarray(pts, jnp.float32), 8))
        assert Y.shape == (512, 81)
        for l in range(9):
            sl = slice(l * l, (l + 1) * (l + 1))
            got = (Y[:, sl] ** 2).sum(-1)
            want = (2 * l + 1) / (4 * np.pi)
            np.testing.assert_allclose(got, want, rtol=2e-4)

    def test_eval_sh_color_dc_only(self):
        shs = jnp.zeros((5, 4, 3)).at[:, 0, :].set(1.0)
        rgb = eval_sh_color(shs, jnp.array([[0.0, 0.0, 1.0]] * 5), 1)
        np.testing.assert_allclose(
            np.asarray(rgb), 0.28209479177387814 + 0.5, atol=1e-6
        )

    def test_eval_sh_color_clamps_negative(self):
        shs = jnp.zeros((1, 4, 3)).at[:, 0, :].set(-10.0)
        rgb = eval_sh_color(shs, jnp.array([[0.0, 0.0, 1.0]]), 1)
        assert float(rgb.min()) == 0.0


class TestQuaternions:
    def test_identity(self):
        R = quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)

    def test_known_rotation(self):
        # 90 deg about z: quat (cos45, 0, 0, sin45)
        s = np.sin(np.pi / 4)
        R = np.asarray(quat_to_rotmat(jnp.array([np.cos(np.pi / 4), 0.0, 0.0, s])))
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)

    def test_roundtrip_random(self):
        rng = np.random.default_rng(2)
        q = np.asarray(normalize_quat(jnp.asarray(rng.normal(size=(64, 4)), jnp.float32)))
        R = quat_to_rotmat(jnp.asarray(q))
        q2 = np.asarray(rotmat_to_quat(R))
        # q and -q are the same rotation
        sign = np.sign((q * q2).sum(-1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-4)

    def test_covariance_psd_and_scale(self):
        rng = np.random.default_rng(3)
        scales = jnp.asarray(np.abs(rng.normal(size=(16, 3))) + 0.1, jnp.float32)
        quats = normalize_quat(jnp.asarray(rng.normal(size=(16, 4)), jnp.float32))
        cov = build_covariance(scales, quats)
        np.testing.assert_allclose(
            np.asarray(cov), np.asarray(jnp.swapaxes(cov, -1, -2)), atol=1e-6
        )
        eig = np.linalg.eigvalsh(np.asarray(cov))
        np.testing.assert_allclose(
            np.sort(eig, -1), np.sort(np.asarray(scales) ** 2, -1), rtol=1e-4
        )


class TestActivations:
    def test_trunc_exp_forward(self):
        np.testing.assert_allclose(float(trunc_exp(jnp.asarray(2.0))), np.exp(2.0), rtol=1e-6)

    def test_trunc_exp_grad_clamped(self):
        g = jax.grad(lambda x: trunc_exp(x))(jnp.asarray(20.0))
        assert float(g) == pytest.approx(np.exp(15.0))
        g2 = jax.grad(lambda x: trunc_exp(x))(jnp.asarray(1.0))
        assert float(g2) == pytest.approx(np.e, rel=1e-6)
