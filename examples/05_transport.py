"""Native TCP topic bus: the ROS pub/sub runtime analog.

A broker (native/transport.cpp) relays length-prefixed framed messages on
named topics. One node publishes a drone pose + an image frame; a second
node (in real deployments: another process or machine) subscribes and
decodes them. Topic names mirror the reference's ROS layout
(`coloc/drone{i}/pose`, rosUtils.hpp:31-40).

Run `make -C coloc_tpu/native` first if the shared library is missing.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root (no install needed)


import time

import numpy as np

from coloc_tpu.io import transport


def main():
    if not transport.available():
        print("native transport library not built - run: make -C coloc_tpu/native")
        return

    with transport.Broker() as broker:
        print(f"broker listening on 127.0.0.1:{broker.port}")

        with transport.Node(broker.port) as sub, \
             transport.Node(broker.port) as pub:
            topic = transport.pose_topic(0)
            sub.subscribe(topic)
            sub.subscribe(transport.image_topic(0))
            time.sleep(0.1)  # let the subscriptions register at the broker

            # publish one pose and one frame
            C = np.array([1.0, 2.0, 3.0])
            rpy = np.array([0.0, 0.1, -0.2])
            cov = 0.01 * np.eye(3)
            pub.publish(topic, transport.encode_pose(
                drone=0, frame=7, timestamp=time.time(), C=C, rpy=rpy,
                cov3=cov))
            img = (np.arange(60 * 80, dtype=np.uint8) % 251).reshape(60, 80)
            pub.publish(transport.image_topic(0),
                        transport.encode_image(0, img, timestamp=time.time()))

            # receive + decode
            pose = transport.decode_pose(sub.receive(topic, timeout=5.0))
            print(f"received pose: drone={pose['drone']} frame={pose['frame']} "
                  f"C={np.asarray(pose['C']).round(2)}")
            drone, img2, ts = transport.decode_image(
                sub.receive(transport.image_topic(0), timeout=5.0))
            assert np.array_equal(img, img2)
            print(f"received image: drone={drone} shape={img2.shape} "
                  f"(bit-exact round trip)")


if __name__ == "__main__":
    main()
