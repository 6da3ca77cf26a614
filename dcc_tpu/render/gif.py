"""Headless trajectory renderer (PIL) — replaces the reference's pyglet/
OpenGL viewer (``envs/mpe/multiagent/rendering.py``; draw calls at
``environment.py:209-315``) with an offline frame writer fed from on-device
rollout state logs.

Feature parity with the reference's viewer: agent bodies with translucent
r_cover / r_comm discs, PoIs colored gray -> green by accumulated energy
(bright green when done, ``CoverageWorld.py:166-168``), comm-link lines
between agents within 2*r_comm (``environment.py:300-305``), the +-bb
boundary square (``environment.py:307-310``), camera range +-2 centered at
the origin (``environment.py:283-287``), 700x700 px.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..envs import EnvConfig, reset, step
from ..envs.coverage import observation

try:  # pillow is available in this image; keep the import soft anyway
    from PIL import Image, ImageDraw

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def rollout_states(
    algo, ts, key: jax.Array, deterministic: bool = False, n_envs: int = 1
):
    """Roll ``n_envs`` envs for episode_length steps, logging renderable
    state: returns dict of numpy arrays pos (T+1,N,2), poi_pos (T+1,M,2),
    energy (T+1,M), poi_done (T+1,M), reward (T,), coverage (T,). With
    ``n_envs > 1`` every array gains a leading-after-time env axis
    ((T+1,E,N,2), ...) — the reference's multi-env render farm
    (``learner.py:195-210`` rolls ``n_render_rollout_threads`` envs and
    saves the tiled GIF)."""
    env_cfg = algo.env_cfg
    # MAPPO names the horizon episode_length; MADDPG steps_per_iter
    T = getattr(algo.cfg, "episode_length", None) or algo.cfg.steps_per_iter
    # scenario dispatch (render follows whatever scenario the algo trains)
    from ..envs import get_scenario

    sc = get_scenario(getattr(algo, "scenario", "coverage"))
    reset_fn, step_fn, obs_fn = sc["reset"], sc["step"], sc["observation"]
    reset_b = jax.vmap(reset_fn, in_axes=(None, 0))
    step_b = jax.vmap(step_fn, in_axes=(None, 0, 0))
    obs_b = jax.vmap(obs_fn, in_axes=(None, 0))

    def body(carry, _):
        state, obs, k = carry
        k, k_act = jax.random.split(k)
        action, _ = algo.act(ts.actor_params, k_act, obs, deterministic)
        new_state, out = step_b(env_cfg, state, action)
        log = (new_state.pos, new_state.poi_pos, new_state.energy,
               new_state.poi_done, out.reward, out.coverage_rate)
        return (new_state, out.obs, k), log

    key, k0 = jax.random.split(key)
    s0 = reset_b(env_cfg, jax.random.split(k0, n_envs))
    obs0 = obs_b(env_cfg, s0)
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=T))
    (sT, _, _), (pos, poi_pos, energy, poi_done, rew, cover) = f((s0, obs0, key))
    # single-env callers keep the env-axis-free layout
    sq = (lambda x: np.asarray(x)[:, 0]) if n_envs == 1 else np.asarray
    cat = lambda first, rest: np.concatenate(
        [sq(np.asarray(first)[None]), sq(rest)], 0
    )
    return {
        "pos": cat(s0.pos, pos),
        "poi_pos": cat(s0.poi_pos, poi_pos),
        "energy": cat(s0.energy, energy),
        "poi_done": cat(s0.poi_done, poi_done),
        "reward": sq(rew),
        "coverage": sq(cover),
    }


def _w2p(xy: np.ndarray, size: int, cam_range: float = 2.0) -> np.ndarray:
    """World [-cam_range, cam_range] -> pixel coords (y flipped)."""
    p = (xy / cam_range + 1.0) * 0.5 * size
    p[..., 1] = size - p[..., 1]
    return p


def draw_frame(
    env_cfg: EnvConfig,
    pos: np.ndarray,
    poi_pos: np.ndarray,
    energy: np.ndarray,
    poi_done: np.ndarray,
    size: int = 700,
) -> np.ndarray:
    """Render one frame to an (size, size, 3) uint8 array."""
    if not _HAS_PIL:  # pragma: no cover
        raise RuntimeError("PIL not available")
    scale = size / 4.0  # world units -> px (cam_range 2 => 4 world units wide)
    img = Image.new("RGBA", (size, size), (255, 255, 255, 255))
    draw = ImageDraw.Draw(img, "RGBA")

    def circle(center, radius_world, rgba):
        c = _w2p(np.array(center, dtype=float), size)
        r = radius_world * scale
        draw.ellipse([c[0] - r, c[1] - r, c[0] + r, c[1] + r], fill=rgba)

    # scenario configs without coverage's fields fall back to sensible
    # defaults (e.g. SpreadConfig: occupy_radius as the cover disc, no comm)
    r_comm = getattr(env_cfg, "r_comm", 0.0)
    r_cover = getattr(
        env_cfg, "r_cover", getattr(env_cfg, "occupy_radius", 0.1)
    )
    m_energy = getattr(env_cfg, "m_energy", 1.0)
    ent_size = getattr(env_cfg, "size", 0.02)

    # boundary square (corners at +-bb)
    bb = getattr(env_cfg, "bb", getattr(env_cfg, "soft_bound", 1.0))
    corners = _w2p(np.array([[bb, bb], [bb, -bb], [-bb, -bb], [-bb, bb], [bb, bb]]), size)
    draw.line([tuple(p) for p in corners], fill=(0, 0, 0, 255), width=2)

    # comm/cover discs (alpha 0.15 over white, environment.py:252-265)
    for p in pos:
        if r_comm > 0:
            circle(p, r_comm, (13, 89, 13, 38))
        circle(p, r_cover, (13, 64, 13, 38))

    # comm links between agents within 2*r_comm
    n = len(pos)
    for a in range(n):
        for b in range(a + 1, n):
            if r_comm > 0 and np.linalg.norm(pos[a] - pos[b]) < 2.0 * r_comm:
                pa, pb = _w2p(pos[a].astype(float), size), _w2p(pos[b].astype(float), size)
                draw.line([tuple(pa), tuple(pb)], fill=(0, 0, 0, 180), width=1)

    # PoIs: color (0.25, 0.25 + energy/m_energy*0.75, 0.25), clamped
    # (CoverageWorld.py:166-168)
    for p, e, d in zip(poi_pos, energy, poi_done):
        g = min(0.25 + float(e) / m_energy * 0.75, 1.0)
        rgba = (64, int(255 * g), 64, 255)
        circle(p, ent_size, rgba)

    # agent bodies (color 0.05,0.15,0.05 alpha 0.5, environment.py:244,275)
    for p in pos:
        circle(p, ent_size, (13, 38, 13, 128))

    return np.asarray(img.convert("RGB"))


def render_gif(
    env_cfg: EnvConfig,
    states: dict,
    path: Optional[str],
    every: int = 1,
    size: int = 700,
    duration: float = 0.1,
) -> List[np.ndarray]:
    """Write a GIF from logged rollout states (the reference saves
    models_<iter>.gif via imageio, learner.py:204-210). Multi-env state
    logs (pos ndim 4, from ``rollout_states(..., n_envs>1)``) are rendered
    per env and tiled into one near-square grid per frame — the reference's
    tiled human-mode render farm (``wrappers.py:69-78`` tile_images)."""
    multi = np.asarray(states["pos"]).ndim == 4
    if multi:
        from ..utils import tile_images

        n_envs = states["pos"].shape[1]
        frames = [
            tile_images(
                np.stack(
                    [
                        draw_frame(
                            env_cfg,
                            states["pos"][t, e],
                            states["poi_pos"][t, e],
                            states["energy"][t, e],
                            states["poi_done"][t, e],
                            size=size,
                        )
                        for e in range(n_envs)
                    ]
                )
            )
            for t in range(0, len(states["pos"]), every)
        ]
    else:
        frames = [
            draw_frame(
                env_cfg,
                states["pos"][t],
                states["poi_pos"][t],
                states["energy"][t],
                states["poi_done"][t],
                size=size,
            )
            for t in range(0, len(states["pos"]), every)
        ]
    if path is not None:
        try:
            import imageio

            imageio.mimsave(path, frames, format="GIF", duration=duration)
        except Exception:  # pragma: no cover - imageio is in the image
            pass
    return frames
