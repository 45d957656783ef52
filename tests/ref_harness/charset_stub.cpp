// ICU replacement for the harness build (ICU headers unavailable offline):
// iso-8859-1 -> UTF-8 is a fixed byte mapping; this matches ucnv_convert's
// output for every latin-1 input, including the std::string NUL-truncation
// the reference applies to the converted buffer.
#include "charset.hpp"

using namespace Digiham;

std::string Converter::convertToUtf8(const char* input, const size_t length,
                                     const char* charset) {
    if (length == 0) return "";
    std::string out;
    out.reserve(length * 2);
    for (size_t i = 0; i < length; i++) {
        unsigned char c = (unsigned char) input[i];
        if (c == 0) break;  // reference: std::string(target) stops at NUL
        if (c < 0x80) {
            out.push_back((char) c);
        } else {
            out.push_back((char) (0xC0 | (c >> 6)));
            out.push_back((char) (0x80 | (c & 0x3F)));
        }
    }
    return out;
}
