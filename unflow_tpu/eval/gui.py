"""Matplotlib result pager (optional; headless eval lives in evaluate.py).

Reference: simonmeister/UnFlow ``src/e2eflow/gui.py::display`` — a
matplotlib window paging through (image, predicted flow color, GT flow
color, error image) per example (SURVEY.md §2.2 P18). Import of
matplotlib is deferred so headless environments never need it.
"""

from __future__ import annotations

import numpy as np

from unflow_tpu.eval.flow_viz import flow_error_image, flow_to_color


def display(results: list[dict]) -> None:
    """Page through eval results.

    Each entry: {'im1': (H,W,3), 'flow': (H,W,2)[, 'gt': (H,W,2),
    'mask': (H,W,1)]}. Keys: n/p or arrow keys to page, q to quit.
    """
    import matplotlib.pyplot as plt  # deferred: optional dependency

    state = {"idx": 0}
    fig, axes = plt.subplots(2, 2, figsize=(12, 6))

    def render():
        entry = results[state["idx"]]
        for ax in axes.flat:
            ax.clear()
            ax.axis("off")
        axes[0, 0].imshow(entry["im1"])
        axes[0, 0].set_title(f"frame 1 [{state['idx'] + 1}/{len(results)}]")
        axes[0, 1].imshow(flow_to_color(entry["flow"]))
        axes[0, 1].set_title("predicted flow")
        if "gt" in entry:
            axes[1, 0].imshow(flow_to_color(entry["gt"]))
            axes[1, 0].set_title("ground truth")
            axes[1, 1].imshow(
                flow_error_image(entry["flow"], entry["gt"], entry.get("mask"))
            )
            axes[1, 1].set_title("error")
        fig.canvas.draw_idle()

    def on_key(event):
        if event.key in ("n", "right"):
            state["idx"] = (state["idx"] + 1) % len(results)
            render()
        elif event.key in ("p", "left"):
            state["idx"] = (state["idx"] - 1) % len(results)
            render()
        elif event.key == "q":
            plt.close(fig)

    fig.canvas.mpl_connect("key_press_event", on_key)
    render()
    plt.show()
