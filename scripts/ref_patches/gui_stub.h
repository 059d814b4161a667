// Headless stub of the reference's util/gui.h (GLFW/OpenGL interactive
// viewer) so pbrt builds in a sandbox without X11/GL. --interactive aborts;
// every other code path is unaffected. Original stub, not pbrt source.
#ifndef PBRT_UTIL_GUI_H
#define PBRT_UTIL_GUI_H

#include <pbrt/pbrt.h>
#include <pbrt/util/color.h>
#include <pbrt/util/error.h>
#include <pbrt/util/transform.h>
#include <pbrt/util/vecmath.h>

#include <string>

namespace pbrt {

enum DisplayState { EXIT, RESET, NONE };

class GUI {
  public:
    GUI(std::string title, Vector2i resolution, Bounds3f sceneBounds)
        : resolution(resolution) {
        ErrorExit("--interactive is unavailable in this headless build");
    }
    ~GUI() {}

    RGB *MapFramebuffer() { return cpuFramebuffer; }
    void UnmapFramebuffer() {}
    DisplayState RefreshDisplay() { return EXIT; }
    Transform GetCameraTransform() const { return movingFromCamera; }
    Float exposure = 1.f;
    bool printCameraTransform = false;

    static void Initialize() {}
    static Point2i GetResolution() {
        ErrorExit("--fullscreen is unavailable in this headless build");
        return Point2i(0, 0);
    }

  private:
    Transform movingFromCamera;
    Vector2i resolution;
    RGB *cpuFramebuffer = nullptr;
};

}  // namespace pbrt

#endif  // PBRT_UTIL_GUI_H
