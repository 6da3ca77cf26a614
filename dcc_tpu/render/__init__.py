from .gif import draw_frame, render_gif, rollout_states

__all__ = ["draw_frame", "render_gif", "rollout_states"]
